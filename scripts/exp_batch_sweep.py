"""Experiment: batch-size sweep of the streaming inference forward.

PERFORMANCE.md's ceiling analysis says the one practical lever left for
the bandwidth-bound forward is larger batches (config 5 runs b8 at
108 img/s).  This sweeps b1..b32 at the KITTI KB-crop shape and reports
DEVICE ms/batch per variant — larger batches amortize the per-program
layout prologue/epilogue and keep the MXU fed across the b-dim, but the
activation working set grows linearly and can spill.

Methodology: device spans from ONE jax.profiler trace, per-variant named
jits (`jit_fwd_b{B}`), warmed before tracing — tunnel walltime is
untrustworthy in both directions (see PERFORMANCE.md gotchas).

Usage: python scripts/exp_batch_sweep.py [--batches 1,2,4,8,16,32] [--steps 8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from bts_tpu.data.augment import eval_preprocess  # noqa: E402
from bts_tpu.models.bts import BtsModel  # noqa: E402


def make_forward(model, variables, batch: int):
    def fwd(images_u8):
        *_, final = model.apply(variables, eval_preprocess(images_u8), False)
        return final

    fwd.__name__ = f"fwd_b{batch}"  # names the device program span
    return jax.jit(fwd)


def device_ms_per_program(tracedir: str):
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True)
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg, cnt = defaultdict(float), defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "")
            if name.startswith("jit_fwd_b"):
                agg[name] += float(e.get("dur", 0.0))
                cnt[name] += 1
    return {n: (agg[n] / 1e3, cnt[n]) for n in agg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8,16,32")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--tracedir", default="/tmp/bts_batch_sweep")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    model = BtsModel(
        encoder_name="densenet161_bts", max_depth=80.0, num_features=512,
        dtype=jnp.bfloat16,
    )
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 192, 3))
    )

    rng = np.random.default_rng(0)
    variants = {}
    for b in batches:
        x = jnp.asarray(
            rng.integers(0, 255, (b, args.height, args.width, 3), dtype=np.uint8)
        )
        fwd = make_forward(model, variables, b)
        try:
            fwd(x).block_until_ready()  # compile
            for _ in range(2):
                fwd(x).block_until_ready()  # warm
        except Exception as e:  # b too large for HBM: record and keep sweeping
            msg = str(e).splitlines()[0][:200]
            print(f"b{b}: SKIPPED ({type(e).__name__}: {msg})")
            continue
        variants[b] = (fwd, x)

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for b, (fwd, x) in variants.items():
            for _ in range(args.steps):
                out = fwd(x)
            out.block_until_ready()

    def batch_of(name):  # span names may carry a fingerprint: jit_fwd_b8(123..)
        return int(name.split("_b")[-1].split("(")[0])

    results = {}
    for name, (ms, n) in sorted(
        device_ms_per_program(args.tracedir).items(), key=lambda kv: batch_of(kv[0])
    ):
        b = batch_of(name)
        per = ms / max(n, 1)
        results[b] = {"device_ms_per_batch": round(per, 3),
                      "images_per_sec": round(b / per * 1e3, 2), "n": n}
        print(f"b{b}: {per:.3f} ms/batch device  ({b / per * 1e3:.1f} img/s)  n={n}")
    print(json.dumps({"experiment": "batch_sweep", "results": results}))


if __name__ == "__main__":
    main()
