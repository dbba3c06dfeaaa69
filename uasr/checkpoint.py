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
