"""Scale-invariant log (silog) training loss.

Contract per SURVEY.md §2.4 (``bts.py/bts_main.py :: silog_loss``):

    d    = log(pred[mask]) - log(gt[mask])
    loss = sqrt(mean(d^2) - variance_focus * mean(d)^2) * 10

with variance_focus = 0.85 by default.  The valid mask is ``gt > 1.0`` for
KITTI (sparse LiDAR) and ``gt > 0.1`` for NYU.  Implemented mask-weighted so
shapes stay static under jit (XLA requirement — no boolean gather).
"""

from __future__ import annotations

import jax.numpy as jnp


def silog_loss(depth_est, depth_gt, mask, variance_focus: float = 0.85):
    """Mask-weighted silog loss; all inputs broadcast-compatible arrays.

    Computed in f32 regardless of input dtype: the loss mixes a difference of
    means whose cancellation is catastrophic in bf16.
    """
    mask = mask.astype(jnp.float32)
    n = jnp.maximum(mask.sum(), 1.0)
    est = jnp.where(mask > 0, depth_est.astype(jnp.float32), 1.0)
    gt = jnp.where(mask > 0, depth_gt.astype(jnp.float32), 1.0)
    d = (jnp.log(est) - jnp.log(gt)) * mask
    mean_d2 = (d * d).sum() / n
    mean_d = d.sum() / n
    # max() guards the sqrt against tiny negative values from cancellation.
    return jnp.sqrt(jnp.maximum(mean_d2 - variance_focus * mean_d * mean_d, 1e-12)) * 10.0


def default_mask(depth_gt, dataset: str):
    """Reference valid-pixel mask: gt > 1.0 (kitti) / gt > 0.1 (nyu)."""
    thresh = 0.1 if dataset == "nyu" else 1.0
    return depth_gt > thresh
