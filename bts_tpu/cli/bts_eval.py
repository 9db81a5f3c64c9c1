"""Metric-evaluation driver (reference ``bts_eval.py``, SURVEY.md §2.13/§3.3).

Loads GT depth PNGs (via the split file + ``--gt_path``) and predicted PNGs
(``--pred_path`` / ``--image_path`` pointing at bts_test.py's ``raw`` output),
clamps to [min_depth_eval, max_depth_eval], applies garg (KITTI default) or
eigen (NYU) crops, and prints the mean 9-metric table over the split.

Pure numpy — no device needed (matches the reference).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from bts_tpu.config import parse_args
from bts_tpu.data.crops import eigen_crop_mask, garg_crop_mask, kb_crop_box
from bts_tpu.data.dataloader import parse_filenames_file
from bts_tpu.data.depth_io import read_depth_png
from bts_tpu.evaluation.metrics import METRIC_NAMES, compute_errors


def sanitize_pred(pred: np.ndarray, cfg) -> np.ndarray:
    """Reference NaN/Inf handling: NaN -> min_depth_eval, Inf -> max, clip."""
    pred = np.where(np.isnan(pred), cfg.min_depth_eval, pred)
    pred = np.where(np.isinf(pred), cfg.max_depth_eval, pred)
    return np.clip(pred, cfg.min_depth_eval, cfg.max_depth_eval)


def pad_pred_to_gt(pred: np.ndarray, gt_shape, cfg) -> np.ndarray:
    """Map a KB-cropped prediction back onto the full-resolution GT frame."""
    if pred.shape == tuple(gt_shape):
        return pred
    top, left, h, w = kb_crop_box(gt_shape[0], gt_shape[1])
    full = np.zeros(gt_shape, pred.dtype)
    full[top : top + h, left : left + w] = pred
    return full


def masked_errors(gt: np.ndarray, pred: np.ndarray, cfg):
    """Shared metric core for bts_eval and online eval: sanitize the pred,
    build the validity mask + garg/eigen crop on the FULL-RES gt, and return
    the 9 metrics (or None when no pixel is valid)."""
    pred = sanitize_pred(pred, cfg)
    valid = (gt > cfg.min_depth_eval) & (gt < cfg.max_depth_eval)
    hh, ww = gt.shape
    if cfg.garg_crop:
        valid &= garg_crop_mask(hh, ww)
    elif cfg.eigen_crop:
        valid &= eigen_crop_mask(hh, ww, cfg.dataset)
    if valid.sum() == 0:
        return None
    return compute_errors(gt[valid], pred[valid])


def evaluate(cfg) -> np.ndarray:
    samples = parse_filenames_file(cfg.filenames_file, cfg.data_path, cfg.gt_path)
    pred_dir = cfg.image_path or cfg.out_path  # dir of predicted PNGs
    accum, missing = [], 0
    from bts_tpu.cli.bts_test import pred_name

    for s in samples:
        if s.depth_path is None:
            continue
        pred_file = os.path.join(pred_dir, pred_name(s.image_path, cfg.data_path) + ".png")
        if not os.path.exists(pred_file):
            # legacy/basename layout fallback
            alt = os.path.join(
                pred_dir, os.path.splitext(os.path.basename(s.image_path))[0] + ".png"
            )
            if os.path.exists(alt):
                pred_file = alt
            else:
                missing += 1
                continue
        gt = read_depth_png(s.depth_path, cfg.dataset)
        pred = read_depth_png(pred_file, cfg.dataset)
        if cfg.do_kb_crop:
            # reference maps the 352x1216 prediction back onto full-res GT
            pred = pad_pred_to_gt(pred, gt.shape, cfg)
        errs = masked_errors(gt, pred, cfg)
        if errs is not None:
            accum.append(errs)
    if missing:
        print(f"[bts_tpu] WARNING: {missing} predictions missing from {pred_dir}")
    if not accum:
        raise SystemExit("no valid samples evaluated")
    return np.mean(np.stack(accum), axis=0)


def print_table(results: np.ndarray) -> None:
    print(("{:>9}" * len(METRIC_NAMES)).format(*METRIC_NAMES))
    print(("{:9.4f}" * len(results)).format(*results))


def main(argv=None):
    cfg = parse_args(argv, mode="eval")
    results = evaluate(cfg)
    print_table(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
