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
        # item_handlers registers the Standard handler up front so
        # item_metadata works on a fresh manager (layout detection below)
        # without a prior save/restore call
        self.mgr = ocp.CheckpointManager(
            self.directory, options=options, item_handlers=ocp.StandardCheckpointHandler()
        )

    def save(self, step: int, state: Any) -> None:
        self.mgr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))

    def save_host(self, step: int, host_tree: Any) -> None:
        """Save an already-on-host pytree (no device_get) — lets callers that
        write several checkpoints per event (per-metric bests) copy the state
        off-device ONCE and reuse it."""
        self.mgr.save(step, args=ocp.args.StandardSave(host_tree))

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def _is_weights_only(self, step: int) -> bool:
        """True if the stored tree is the weights-only best-checkpoint layout
        (step/params/batch_stats, no opt_state — evaluation.best)."""
        try:
            return "opt_state" not in self.mgr.item_metadata(step).tree
        except Exception:
            return False  # assume the full-TrainState layout

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if hasattr(state_template, "opt_state") and self._is_weights_only(step):
            # a best checkpoint (weights only) restored into a full TrainState
            # template: opt state stays fresh (the reference's best files are
            # model weights too — inference/fine-tune entry, not exact resume)
            tpl = {
                "step": state_template.step,
                "params": state_template.params,
                "batch_stats": state_template.batch_stats,
            }
            r = self.mgr.restore(step, args=ocp.args.StandardRestore(tpl))
            return state_template.replace(
                step=r["step"], params=r["params"], batch_stats=r["batch_stats"]
            )
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
