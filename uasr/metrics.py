"""Structured metrics: JSONL + stdout (+ optional TensorBoard).

The reference logged scalars through tf.summary and printed step
progress (SURVEY.md §5 "Metrics / logging"). Here the primary sink is a
JSONL file (machine-readable, survives without TensorBoard); TB export
is optional and gated on TF being importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricWriter:
    def __init__(self, directory: str, also_tensorboard: bool = False):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if also_tensorboard:
            try:  # optional; tf is in the image but keep it soft
                import tensorflow as tf  # noqa: PLC0415

                self._tb = tf.summary.create_file_writer(
                    os.path.join(directory, "tb")
                )
            except Exception:
                self._tb = None

    def write(self, step: int, tag: str = "train", **scalars: Any) -> None:
        rec = {"step": int(step), "tag": tag, "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = v
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf  # noqa: PLC0415

            with self._tb.as_default():
                for k, v in scalars.items():
                    try:
                        tf.summary.scalar(f"{tag}/{k}", float(v), step=step)
                    except (TypeError, ValueError):
                        pass

    def close(self) -> None:
        self._f.close()


def log_stdout(step: int, tag: str, **scalars) -> None:
    parts = " ".join(
        f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
        for k, v in scalars.items()
    )
    print(f"[{tag}] step {step}: {parts}", flush=True)
