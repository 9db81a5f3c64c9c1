"""Generate reference-format split files (train_test_inputs/*.txt).

The reference ships the canonical Eigen/NYU split lists (SURVEY.md §2.15,
~23k KITTI train lines etc.).  Those lists are derived data tied to the
datasets themselves; this tool regenerates them from a local dataset tree so
users without the original lists can produce byte-compatible ones:

    python scripts/make_split.py --data_path <kitti_raw> --gt_path <kitti_gt> \
        --dataset kitti --out train_test_inputs/eigen_train_files_with_gt.txt

Line format: ``<image_rel> <depth_rel_or_None> <focal>``.
"""

from __future__ import annotations

import argparse
import os
import sys

KITTI_FOCALS = {
    "2011_09_26": 721.5377,
    "2011_09_28": 707.0493,
    "2011_09_29": 718.3351,
    "2011_09_30": 707.0912,
    "2011_10_03": 718.856,
}
NYU_FOCAL = 518.8579


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--gt_path", default="")
    p.add_argument("--dataset", choices=["kitti", "nyu"], required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--camera", default="image_02")
    args = p.parse_args()

    lines = []
    for root, _, files in os.walk(args.data_path):
        for f in sorted(files):
            if not f.endswith((".png", ".jpg")):
                continue
            img = os.path.relpath(os.path.join(root, f), args.data_path)
            if args.dataset == "kitti":
                if args.camera not in img or "/data/" not in img:
                    continue
                drive_date = img.split("/")[0]
                focal = KITTI_FOCALS.get(drive_date, 721.5377)
                gt = None
                if args.gt_path:
                    cand = os.path.join(
                        args.gt_path,
                        img.split("/")[1] if "/" in img else "",
                        "proj_depth/groundtruth",
                        args.camera,
                        f,
                    )
                    gt = os.path.relpath(cand, args.gt_path) if os.path.exists(cand) else None
                lines.append(f"{img} {gt or 'None'} {focal}\n")
            else:
                if "rgb" not in f:
                    continue
                gt = img.replace("rgb", "sync_depth").replace(".jpg", ".png")
                if args.gt_path and not os.path.exists(os.path.join(args.gt_path, gt)):
                    gt = "None"
                lines.append(f"{img} {gt} {NYU_FOCAL}\n")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.writelines(lines)
    print(f"wrote {len(lines)} lines to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
