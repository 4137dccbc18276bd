"""Orbax checkpointing with keep-N and auto-resume.

TPU-native equivalent of the reference CheckpointHook + ``--resume auto``
(configs/default_runtime.py:6-8, tools/train.py:111-117): step-stamped
checkpoints under the work dir, keep the most recent N, resume from the
latest on restart.
"""

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, work_dir: str, max_keep: int = 4):
        path = os.path.abspath(os.path.join(work_dir, 'checkpoints'))
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_keep,
                                                 create=True))

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        """Restore into the structure of ``state_template`` (auto-latest)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return None
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(state_template))
