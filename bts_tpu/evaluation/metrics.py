"""The 9-metric Eigen-split evaluation suite.

Contract per SURVEY.md §2.13 (``bts_eval.py :: compute_errors``): given valid
(masked, clamped) gt/pred depth vectors, return

    silog, abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3

with the standard BTS-lineage formulas:
    thresh  = max(gt/pred, pred/gt);  d_i = mean(thresh < 1.25**i)
    rms     = sqrt(mean((gt - pred)^2))
    log_rms = sqrt(mean((log gt - log pred)^2))
    abs_rel = mean(|gt - pred| / gt)
    sq_rel  = mean((gt - pred)^2 / gt)
    silog   = sqrt(mean(err^2) - mean(err)^2) * 100,  err = log pred - log gt
    log10   = mean(|log10 pred - log10 gt|)

Two implementations: numpy (host-side eval driver) and jnp (on-device online
eval under jit, mask-weighted so shapes stay static for XLA).
"""

from __future__ import annotations

import numpy as np

METRIC_NAMES = (
    "silog",
    "abs_rel",
    "log10",
    "rms",
    "sq_rel",
    "log_rms",
    "d1",
    "d2",
    "d3",
)


def compute_errors(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """Reference-exact 9 metrics over already-masked 1-D gt/pred arrays."""
    gt = np.asarray(gt, dtype=np.float64)
    pred = np.asarray(pred, dtype=np.float64)
    thresh = np.maximum(gt / pred, pred / gt)
    d1 = float((thresh < 1.25).mean())
    d2 = float((thresh < 1.25**2).mean())
    d3 = float((thresh < 1.25**3).mean())

    rms = float(np.sqrt(((gt - pred) ** 2).mean()))
    log_rms = float(np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean()))

    abs_rel = float(np.mean(np.abs(gt - pred) / gt))
    sq_rel = float(np.mean(((gt - pred) ** 2) / gt))

    err = np.log(pred) - np.log(gt)
    silog = float(np.sqrt(np.mean(err**2) - np.mean(err) ** 2) * 100)

    log10 = float(np.mean(np.abs(np.log10(pred) - np.log10(gt))))
    return np.array([silog, abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3])


def compute_errors_jnp(gt, pred, mask):
    """Mask-weighted jnp version for on-device online eval (static shapes).

    ``mask`` is a boolean array; invalid pixels contribute zero weight.  The
    formulas match :func:`compute_errors` on the masked subset.
    """
    import jax.numpy as jnp  # lazy: keeps the numpy-only eval driver jax-free

    mask = mask.astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    # Guard invalid entries so log/division stay finite under the mask.
    safe_gt = jnp.where(mask > 0, gt, 1.0)
    safe_pred = jnp.where(mask > 0, pred, 1.0)

    def mmean(x):
        return (x * mask).sum() / n

    thresh = jnp.maximum(safe_gt / safe_pred, safe_pred / safe_gt)
    d1 = mmean((thresh < 1.25).astype(jnp.float32))
    d2 = mmean((thresh < 1.25**2).astype(jnp.float32))
    d3 = mmean((thresh < 1.25**3).astype(jnp.float32))

    rms = jnp.sqrt(mmean((safe_gt - safe_pred) ** 2))
    log_diff = jnp.log(safe_gt) - jnp.log(safe_pred)
    log_rms = jnp.sqrt(mmean(log_diff**2))

    abs_rel = mmean(jnp.abs(safe_gt - safe_pred) / safe_gt)
    sq_rel = mmean((safe_gt - safe_pred) ** 2 / safe_gt)

    err = jnp.log(safe_pred) - jnp.log(safe_gt)
    # clamp: f32 cancellation can push the variance term slightly negative
    silog = jnp.sqrt(jnp.maximum(mmean(err**2) - mmean(err) ** 2, 0.0)) * 100.0

    log10 = mmean(jnp.abs(jnp.log10(safe_pred) - jnp.log10(safe_gt)))
    return jnp.stack([silog, abs_rel, log10, rms, sq_rel, log_rms, d1, d2, d3])
