"""Attribute the host-side input pipeline: ms/image per decode path.

Round-3 verdict weak #5: the claim "CLI training is host-decode-bound at
~8-12 img/s on this 1-core box" was asserted, not attributed.  This script
measures the three decode paths the loader exposes — native C++
(`native/btsdata.cc`), PIL fallback, and ArrayRecord — on a synthetic
KITTI-geometry split (375x1242 RGB uint8 + uint16 depth PNGs, KB-crop to
352x1216, train mode with depth), at 1 and 2 decode threads.

On THIS 1-core host thread counts cannot add throughput (PIL's zlib drops
the GIL and the native pool is real, but there is one core to share) — the
number that transfers to production hosts is **ms of CPU per image per
core**, and the break-even core count printed at the end is
``device_rate * s_per_img`` (linear scaling across cores, which PNG decode
is: each image is independent).

Usage:  python scripts/bench_input.py [--images 48] [--batches 12]
Writes INPUT_BENCH.json and prints a PERFORMANCE.md-ready table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def make_dataset(root: str, n: int) -> str:
    """Synthetic KITTI-raw-geometry PNG tree; returns the filenames file.

    Natural-image-ish content (smoothed noise) so PNG deflate ratios — and
    therefore inflate cost, the dominant term — resemble camera frames
    rather than incompressible noise or flat fills.
    """
    from PIL import Image

    rgb_dir = os.path.join(root, "rgb")
    dep_dir = os.path.join(root, "depth")
    os.makedirs(rgb_dir, exist_ok=True)
    os.makedirs(dep_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        base = rng.integers(0, 255, (375 // 8, 1242 // 8, 3), dtype=np.uint8)
        img = np.asarray(
            Image.fromarray(base).resize((1242, 375), Image.BILINEAR), np.uint8
        )
        img = np.clip(img + rng.integers(-8, 8, img.shape), 0, 255).astype(np.uint8)
        d = (rng.uniform(1.0, 79.0, (375 // 8, 1242 // 8)) * 256).astype(np.uint16)
        d = np.array(Image.fromarray(d).resize((1242, 375), Image.NEAREST))
        d[rng.random(d.shape) < 0.6] = 0  # sparse LiDAR-like GT
        Image.fromarray(img).save(os.path.join(rgb_dir, f"{i:04d}.png"))
        Image.fromarray(d).save(os.path.join(dep_dir, f"{i:04d}.png"))
        lines.append(f"rgb/{i:04d}.png depth/{i:04d}.png 721.5377")
    fn = os.path.join(root, "split.txt")
    with open(fn, "w") as f:
        f.write("\n".join(lines))
    return fn


def make_cfg(root: str, fn: str, native: str, workers: int):
    from bts_tpu.config import Config

    return Config(
        mode="train",
        dataset="kitti",
        data_path=root,
        gt_path=root,
        filenames_file=fn,
        batch_size=8,
        do_kb_crop=True,
        use_native_loader=native,
        dataloader_workers=workers,
        num_threads=workers,
    )


def measure(cfg, n_batches: int) -> dict:
    """Steady-state s/image over ``n_batches`` after a 2-batch warm-up."""
    from bts_tpu.data.dataloader import BtsDataLoader

    loader = BtsDataLoader(cfg, "train")
    it = loader.prefetched(num_epochs=None)
    for _ in range(2):
        next(it)
    t0 = time.perf_counter()
    images = 0
    for _ in range(n_batches):
        b = next(it)
        images += b["image"].shape[0]
    dt = time.perf_counter() - t0
    it.close()
    return {"s_per_img": dt / images, "img_per_s": images / dt}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--device_rate", type=float, default=64.0,
                    help="img/s the device sustains (config-4 train measured)")
    args = ap.parse_args(argv)

    results = []
    with tempfile.TemporaryDirectory() as root:
        fn = make_dataset(root, args.images)

        from bts_tpu.data import native_loader as nl
        from bts_tpu.data.dataloader import parse_filenames_file
        from bts_tpu.data.records import write_records

        paths = [("pil", "never"), ("native", "always")] if nl.available() else [("pil", "never")]
        for name, mode in paths:
            for workers in (1, 2):
                r = measure(make_cfg(root, fn, mode, workers), args.batches)
                results.append({"path": name, "threads": workers, **r})
                print(json.dumps(results[-1]), flush=True)

        # ArrayRecord: pack the same PNGs, read by index (production path)
        try:
            samples = parse_filenames_file(fn, root, root)
            prefix = os.path.join(root, "rec")
            write_records(samples, prefix, shard_size=1024)
            rec_fn = prefix + "-*.array_record"
            rec_variants = [("arrayrecord", "never")]
            if nl.available():
                # record payloads decoded through the native in-memory path
                rec_variants.append(("arrayrecord+native", "auto"))
            for rname, rmode in rec_variants:
                for workers in (1, 2):
                    r = measure(make_cfg(root, rec_fn, rmode, workers), args.batches)
                    results.append({"path": rname, "threads": workers, **r})
                    print(json.dumps(results[-1]), flush=True)
        except ImportError as e:
            print(f"[bench_input] array_record unavailable ({e}); skipped", flush=True)

    best = min(results, key=lambda r: r["s_per_img"])
    summary = {
        "host_cores": os.cpu_count(),
        "geometry": "KITTI 375x1242 -> KB-crop 352x1216, batch 8, train (rgb+depth)",
        "results": results,
        "best_path": best["path"],
        "breakeven_cores_config4": args.device_rate * best["s_per_img"],
    }
    with open(os.path.join(REPO, "INPUT_BENCH.json"), "w") as f:
        json.dump(summary, f, indent=1)

    print(f"\n| path | threads | ms/img | img/s |")
    print(f"|---|---|---|---|")
    for r in results:
        print(f"| {r['path']} | {r['threads']} | {r['s_per_img']*1e3:.1f} | {r['img_per_s']:.1f} |")
    print(
        f"\nbreak-even for config-4's {args.device_rate:.0f} img/s device rate: "
        f"{summary['breakeven_cores_config4']:.1f} cores on the best path "
        f"({best['path']} @ {best['s_per_img']*1e3:.1f} ms/img/core)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
