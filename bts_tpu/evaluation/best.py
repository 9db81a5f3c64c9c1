"""Best online-eval metric tracking + best-checkpoint retention.

Reference counterpart (SURVEY.md §2.1 train driver, upstream lineage [M]):
``bts_main`` keeps ``best_eval_measures_lower_better`` (silog, abs_rel,
log10, rms, sq_rel, log_rms) and ``best_eval_measures_higher_better``
(d1, d2, d3) across online evals, and on improvement saves a per-metric
"best" model file, replacing the previous one.

TPU-native mapping: best values persist in a JSON sidecar next to the
checkpoints (resume-safe — a restarted run keeps competing against its own
history instead of resetting the bar), and each improved metric gets an
orbax checkpoint under ``ckpt_best/<metric>/`` with ``max_to_keep=1`` (the
replace-previous semantics).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence

from bts_tpu.evaluation.metrics import METRIC_NAMES

# silog..log_rms improve downward; d1/d2/d3 (delta accuracies) upward
LOWER_BETTER = frozenset(METRIC_NAMES[:6])
HIGHER_BETTER = frozenset(METRIC_NAMES[6:])


class BestTracker:
    """Track per-metric best eval values across a run, persisted to JSON."""

    def __init__(self, logdir: str, filename: str = "best_eval.json"):
        self.path = os.path.join(logdir, filename)
        self.best: Dict[str, dict] = {}
        if os.path.exists(self.path):
            try:
                with open(self.path) as f:
                    self.best = json.load(f)
            except (json.JSONDecodeError, OSError):
                self.best = {}

    def update(
        self, step: int, results: Sequence[float], persist: bool = True
    ) -> List[str]:
        """Record one eval's 9-metric results; return improved metric names.

        ``results`` is ordered like METRIC_NAMES (what ``online_eval``
        returns). Non-finite values never count as improvements.

        ``persist=False`` defers the sidecar write to an explicit
        :meth:`persist` — the train driver writes the sidecar only AFTER the
        matching best checkpoints have committed, so a crash between the two
        can never leave a bar that permanently suppresses re-saving a best
        that was never stored (strict </> comparison on resume).
        """
        import math

        improved = []
        for name, value in zip(METRIC_NAMES, results):
            value = float(value)
            if not math.isfinite(value):
                continue
            prev = self.best.get(name)
            better = (
                prev is None
                or (name in LOWER_BETTER and value < prev["value"])
                or (name in HIGHER_BETTER and value > prev["value"])
            )
            if better:
                self.best[name] = {"value": value, "step": int(step)}
                improved.append(name)
        if improved and persist:
            self.persist()
        return improved

    def persist(self) -> None:
        """Atomically write the current bar to the JSON sidecar."""
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.best, f, indent=1)
        os.replace(tmp, self.path)

    def reset(self) -> None:
        """Drop the bar and delete the sidecar (``--retrain`` into a reused
        logdir: a step-0 run must not compete against the old run's bests)."""
        self.best = {}
        if os.path.exists(self.path):
            os.remove(self.path)


class BestCheckpoints:
    """One ``max_to_keep=1`` orbax manager per improved metric, lazily built
    under ``root/<metric>/`` — saving a later best replaces the previous one
    (the reference deletes its old best model file the same way)."""

    def __init__(self, root: str):
        self.root = root
        self._mgrs: Dict[str, object] = {}

    def save(self, metrics: Sequence[str], step: int, state) -> None:
        """Save WEIGHTS-ONLY best checkpoints (step/params/batch_stats) for
        each improved metric, and return only once they are all COMMITTED.

        One device->host copy per eval regardless of how many metrics
        improved; opt_state is excluded (the reference's per-metric best
        files hold model weights only, and AdamW state would triple the
        bytes x up to 9 metrics).  The blocking commit is what lets the
        caller order the best_eval.json sidecar write strictly after the
        checkpoints exist.
        """
        import jax

        from bts_tpu.utils.checkpoint import CheckpointManager

        host = jax.device_get(
            {"step": state.step, "params": state.params, "batch_stats": state.batch_stats}
        )
        touched = []
        for name in metrics:
            mgr = self._mgrs.get(name)
            if mgr is None:
                mgr = CheckpointManager(
                    os.path.join(self.root, name), max_to_keep=1
                )
                self._mgrs[name] = mgr
            mgr.save_host(step, host)
            touched.append(mgr)
        for mgr in touched:
            mgr.wait()

    def reset(self) -> None:
        """Delete all per-metric best checkpoints (``--retrain`` counterpart
        of BestTracker.reset)."""
        import shutil

        self.close()
        if os.path.isdir(self.root):
            shutil.rmtree(self.root)

    def close(self) -> None:
        for mgr in self._mgrs.values():
            mgr.wait()
            mgr.close()
        self._mgrs.clear()
