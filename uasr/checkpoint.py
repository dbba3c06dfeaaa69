"""Checkpointing with reference-compatible semantics via Orbax.

Reference behavior to preserve (SURVEY.md §5 "Checkpoint / resume"):
directory-per-config, keep-N latest (`CheckpointManager(max_to_keep)`),
restore-latest at startup (implicit resume), infer restores latest.
The on-disk format is Orbax's, but the behavioral contract matches, so
recipes are drop-in. Async save keeps the device busy while the host
writes (preemption-safe: `close()` waits for in-flight saves).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def restore(self, step: int, abstract_state: Any) -> Any:
        """Restore a specific retained step (see all_steps)."""
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract_state)
        )

    def restore_latest(self, abstract_state: Any) -> tuple[Any, int] | None:
        """Restore the newest checkpoint into the structure of
        `abstract_state` (a matching pytree, e.g. a freshly-initialized
        state). Returns (state, step) or None if no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(abstract_state)
            )
        except ValueError as e:
            if "do not match" not in str(e):
                raise
            # Orbax's structure-mismatch error names pytree node types
            # but not the likely cause — translate it
            raise ValueError(
                f"checkpoint at step {step} under {self.directory!r} has "
                "a different state structure than the current config "
                "builds (typical causes: train.grad_accum or optimizer/"
                "model hyperparameters changed since the run was saved). "
                "Resume with the original settings or start a fresh "
                f"model_dir. Original error:\n{e}"
            ) from e
        return state, step

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def restore_averaged(
    mgr: CheckpointManager, abstract_state: Any, last_n: int
) -> tuple[Any, int] | None:
    """Restore the newest `last_n` retained checkpoints and average
    their float leaves (checkpoint averaging — the standard ASR eval
    trick: the mean of the last N training snapshots decodes better
    than any single one). Non-float leaves (step counters, int state)
    come from the newest checkpoint. Uses every retained step when
    fewer than `last_n` exist; returns (state, newest_step) or None if
    the directory is empty.

    Averaging happens on the HOST in float64 numpy: restored arrays
    may live on a remote TPU, where eager per-leaf arithmetic would be
    one network round trip per op (CLAUDE.md), and f64 accumulation
    keeps the mean exact regardless of N."""
    import jax
    import numpy as np

    steps = mgr.all_steps()
    if not steps:
        return None
    take = steps[-max(int(last_n), 1):]
    acc = None
    newest = None
    for s in take:
        host = jax.device_get(mgr.restore(s, abstract_state))
        newest = host
        leaves = jax.tree.leaves(host)
        vals = [
            np.asarray(x, np.float64)
            if np.issubdtype(np.asarray(x).dtype, np.floating) else None
            for x in leaves
        ]
        acc = vals if acc is None else [
            None if a is None else a + v for a, v in zip(acc, vals)
        ]
    out_leaves = [
        leaf if a is None
        else (a / len(take)).astype(np.asarray(leaf).dtype)
        for a, leaf in zip(acc, jax.tree.leaves(newest))
    ]
    treedef = jax.tree.structure(newest)
    return jax.tree.unflatten(treedef, out_leaves), int(take[-1])
