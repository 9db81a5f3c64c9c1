"""Experiment: bf16 PARAM STORAGE for the inference/serving path.

The last unmeasured HBM traffic class (round-4 verdict #6 / PERFORMANCE.md
roofline): the b1 352x1216 DenseNet-161 forward moves ~9.4 GB/step, of
which the f32 weights are ~110 MB (~1.2%).  Compute already runs in bf16
(params are cast per-use), so storing the params in bf16 halves the weight
traffic and removes the cast — predicted ~<=1% win, measured anyway because
prediction is not measurement.

Also reports the output deviation bf16-storage introduces vs f32 masters
(inference-only consideration; training keeps f32 masters regardless —
CLAUDE.md: BN and LPG division stay f32, which model code enforces in
compute, independent of storage dtype).

Methodology: DEVICE time from jax.profiler traces, NOT walltime (tunnel
walltime reads both ~10x slow and ~15x fast — PERFORMANCE.md gotchas).
Each variant's jitted program gets a distinct name so one trace yields
per-variant device ms/step.

Usage: python scripts/exp_bf16_params.py [--steps 30]
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


def cast_storage(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_forward(model, name: str):
    def fwd(params, batch_stats, images_u8):
        *_, final = model.apply(
            {"params": params, "batch_stats": batch_stats},
            eval_preprocess(images_u8),
            False,
        )
        return final

    fwd.__name__ = name  # names the device program span
    return jax.jit(fwd)


def device_ms_per_program(tracedir: str, prefix: str = "jit_fwd_"):
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
            if name.startswith(prefix):
                agg[name] += float(e.get("dur", 0.0))
                cnt[name] += 1
    return {n: (agg[n] / 1e3, cnt[n]) for n in agg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--tracedir", default="/tmp/bts_bf16params_profile")
    args = ap.parse_args()

    model = BtsModel(
        encoder_name="densenet161_bts", max_depth=80.0, num_features=512,
        dtype=jnp.bfloat16,
    )
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 192, 3))
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (1, 352, 1216, 3), dtype=np.uint8))

    variants = {}
    for name, dtype in (("fwd_f32store", jnp.float32), ("fwd_bf16store", jnp.bfloat16)):
        params = cast_storage(variables["params"], dtype)
        bs = cast_storage(variables["batch_stats"], dtype)
        fwd = make_forward(model, name)
        a = (params, bs, images)
        fwd(*a).block_until_ready()  # compile
        for _ in range(3):
            fwd(*a).block_until_ready()  # warm
        variants[name] = (fwd, a)

    # numeric deviation of bf16 storage vs f32 masters (depth, metres)
    d32 = np.asarray(variants["fwd_f32store"][0](*variants["fwd_f32store"][1]), np.float64)
    d16 = np.asarray(variants["fwd_bf16store"][0](*variants["fwd_bf16store"][1]), np.float64)
    abs_rel = float(np.mean(np.abs(d16 - d32) / np.maximum(d32, 1e-3)))
    max_abs = float(np.max(np.abs(d16 - d32)))

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for name, (fwd, a) in variants.items():
            for _ in range(args.steps):
                out = fwd(*a)
            out.block_until_ready()

    result = {"abs_rel_vs_f32store": abs_rel, "max_abs_m": max_abs}
    for name, (ms, n) in sorted(device_ms_per_program(args.tracedir).items()):
        per = ms / max(n, 1)
        result[name + "_ms"] = round(per, 3)
        print(f"{name}: {per:.3f} ms/step device  ({1000.0 / per:.1f} img/s)  n={n}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
