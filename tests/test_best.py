"""BestTracker: per-metric improvement directions + JSON persistence.

Reference parity (SURVEY.md §2.1 [M]): the train driver keeps best values
of the 9 eval metrics (silog..log_rms lower-better, d1..d3 higher-better)
and replaces per-metric best checkpoints on improvement.
"""

import numpy as np

from bts_tpu.evaluation.best import HIGHER_BETTER, LOWER_BETTER, BestTracker
from bts_tpu.evaluation.metrics import METRIC_NAMES


def _results(**over):
    base = {
        "silog": 10.0, "abs_rel": 0.10, "log10": 0.05, "rms": 4.0,
        "sq_rel": 0.8, "log_rms": 0.2, "d1": 0.90, "d2": 0.97, "d3": 0.99,
    }
    base.update(over)
    return [base[n] for n in METRIC_NAMES]


def test_direction_partition():
    assert LOWER_BETTER | HIGHER_BETTER == set(METRIC_NAMES)
    assert LOWER_BETTER == {"silog", "abs_rel", "log10", "rms", "sq_rel", "log_rms"}
    assert HIGHER_BETTER == {"d1", "d2", "d3"}


def test_tracker_directions_and_persistence(tmp_path):
    t = BestTracker(str(tmp_path))
    # first eval: everything is a new best
    assert t.update(100, _results()) == list(METRIC_NAMES)

    # lower abs_rel improves; lower d1 does NOT (higher-better)
    improved = t.update(200, _results(abs_rel=0.08, d1=0.85))
    assert improved == ["abs_rel"]
    assert t.best["abs_rel"] == {"value": 0.08, "step": 200}
    assert t.best["d1"] == {"value": 0.90, "step": 100}

    # higher d2 improves; equal values never do; NaN never does
    improved = t.update(300, _results(d2=0.98, silog=float("nan")))
    assert improved == ["d2"]

    # persistence: a fresh tracker resumes against the same bar
    t2 = BestTracker(str(tmp_path))
    assert t2.best == t.best
    assert t2.update(400, _results()) == []  # nothing beats the history


def test_tracker_accepts_numpy_results(tmp_path):
    t = BestTracker(str(tmp_path))
    improved = t.update(1, np.asarray(_results(), dtype=np.float64))
    assert improved == list(METRIC_NAMES)
    # json round-trip stored plain floats
    t2 = BestTracker(str(tmp_path))
    assert isinstance(t2.best["rms"]["value"], float)


def test_tracker_deferred_persist_and_reset(tmp_path):
    """persist=False defers the sidecar write until the caller confirms the
    matching best checkpoints committed (advisor: a crash between sidecar
    and checkpoint must not leave a bar with no stored weights)."""
    t = BestTracker(str(tmp_path))
    improved = t.update(10, _results(), persist=False)
    assert improved == list(METRIC_NAMES)
    assert BestTracker(str(tmp_path)).best == {}  # nothing on disk yet
    t.persist()
    assert BestTracker(str(tmp_path)).best == t.best

    t.reset()
    assert t.best == {}
    assert BestTracker(str(tmp_path)).best == {}  # sidecar deleted


def test_best_checkpoints_weights_only_roundtrip(tmp_path):
    """BestCheckpoints stores step/params/batch_stats only (no opt_state —
    reference best files are model weights), ONE device_get per eval, and
    CheckpointManager.restore merges that layout back into a full
    TrainState template (the bts_test --checkpoint_path ckpt_best/<m> path)."""
    import jax
    import jax.numpy as jnp
    import optax

    from bts_tpu.evaluation.best import BestCheckpoints
    from bts_tpu.training.trainer import TrainState
    from bts_tpu.utils.checkpoint import CheckpointManager

    tx = optax.adam(1e-3)
    variables = {"params": {"w": jnp.arange(4.0)}, "batch_stats": {"m": jnp.ones(2)}}
    state = TrainState.create(variables, tx)
    state = state.replace(step=jnp.int32(7), params={"w": jnp.full(4, 3.25)})

    bc = BestCheckpoints(str(tmp_path / "ckpt_best"))
    calls = []
    orig = jax.device_get
    try:
        jax.device_get = lambda x: calls.append(1) or orig(x)
        bc.save(["abs_rel", "d1"], 7, state)
    finally:
        jax.device_get = orig
    assert sum(calls) == 1  # one host copy for both metrics
    bc.close()

    # stored tree has no opt_state
    import os

    assert os.path.isdir(tmp_path / "ckpt_best" / "abs_rel" / "7")

    fresh = TrainState.create(
        {"params": {"w": jnp.zeros(4)}, "batch_stats": {"m": jnp.zeros(2)}}, tx
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt_best" / "abs_rel"))
    restored = mgr.restore(fresh)
    mgr.close()
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), 3.25)
    np.testing.assert_array_equal(np.asarray(restored.batch_stats["m"]), 1.0)
    assert int(restored.step) == 7
    # opt_state stays the fresh template's (weights-only restore)
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(fresh.opt_state)
