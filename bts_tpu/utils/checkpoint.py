"""Orbax checkpointing: params + opt_state + step + PRNG, with auto-resume.

Reference counterpart (SURVEY.md §2.12/§5): ``tf.train.Checkpoint``/
``save_weights`` every ``--save_freq`` steps into
``log_directory/model_name``, restored via ``--checkpoint_path``;
``--retrain`` restores weights but resets the step counter.

TPU-native: orbax async checkpointing (device->host copy overlaps the next
step's compute), full train-state PyTree (params, batch_stats, opt_state,
step) so resume is exact.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=async_save
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self.mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def wait(self) -> None:
        self.mgr.wait_until_finished()

    def close(self) -> None:
        self.mgr.close()


def restore_for_retrain(mgr: CheckpointManager, state_template):
    """--retrain semantics: restore weights, reset step + opt state."""
    import jax.numpy as jnp

    restored = mgr.restore(state_template)
    return state_template.replace(
        params=restored.params,
        batch_stats=restored.batch_stats,
        step=jnp.zeros((), jnp.int32),
    )
