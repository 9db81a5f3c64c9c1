import jax.numpy as jnp
import numpy as np

from bts_tpu.evaluation.metrics import METRIC_NAMES, compute_errors, compute_errors_jnp


def test_perfect_prediction_zero_errors():
    gt = np.linspace(1.0, 80.0, 100)
    m = compute_errors(gt, gt)
    named = dict(zip(METRIC_NAMES, m))
    assert named["abs_rel"] == 0.0
    assert named["rms"] == 0.0
    assert named["d1"] == 1.0 and named["d3"] == 1.0
    assert abs(named["silog"]) < 1e-6


def test_closed_form_constant_ratio():
    # pred = 1.3 * gt: abs_rel = 0.3, silog = 0 (scale-invariant!), d1 = 0.
    gt = np.linspace(1.0, 10.0, 50)
    pred = 1.3 * gt
    named = dict(zip(METRIC_NAMES, compute_errors(gt, pred)))
    assert np.isclose(named["abs_rel"], 0.3)
    assert abs(named["silog"]) < 1e-6  # constant log offset has zero variance
    assert named["d1"] == 0.0  # 1.3 > 1.25
    assert named["d2"] == 1.0  # 1.3 < 1.5625
    assert np.isclose(named["log10"], np.log10(1.3))


def test_jnp_matches_numpy(rng):
    gt = rng.uniform(1.0, 80.0, size=(37,)).astype(np.float32)
    pred = gt * rng.uniform(0.7, 1.4, size=(37,)).astype(np.float32)
    ref = compute_errors(gt, pred)
    # embed into a padded masked array like the on-device eval path does
    gt_pad = np.concatenate([gt, np.zeros(11, np.float32)])
    pred_pad = np.concatenate([pred, np.ones(11, np.float32)])
    mask = np.concatenate([np.ones(37, bool), np.zeros(11, bool)])
    out = np.asarray(compute_errors_jnp(jnp.array(gt_pad), jnp.array(pred_pad), jnp.array(mask)))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
