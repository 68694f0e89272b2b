"""Sharded checkpoint save/restore (Orbax).

The reference writes `tf.train.Checkpoint`s per epoch and for the best model
(src/recommender/models/BPRMF.py:53,158-160,177-179) but has NO restore path
— `--restore_epochs` is parsed and never used (SURVEY.md §5).  Here the full
train-state pytree (params + Adam moments + step) checkpoints through Orbax,
preserving shardings, with periodic saves, best-state tracking, and real
resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from fashionvisualexpl_tpu.core.train_state import TrainState


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for the train-state pytree.

    Layout: {directory}/{step}/state (periodic) and {directory}/best/state
    (best-validation params only).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_dir = os.path.join(self.directory, "best-state")

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState, step: Optional[int] = None) -> TrainState:
        """Restore into the structure/shardings of `template`."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def save_best(self, params: Any) -> None:
        ckptr = ocp.StandardCheckpointer()
        path = self._best_dir
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, params)
        ckptr.wait_until_finished()

    def restore_best(self, template_params: Any) -> Any:
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, template_params
        )
        return ckptr.restore(self._best_dir, abstract)

    def close(self) -> None:
        self._mgr.close()
