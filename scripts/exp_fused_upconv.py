"""Experiment: fused lhs-dilated upsample-conv (UpConv) vs literal two-op.

UpConv_4 (nearest-2x upsample to FULL res + 3x3 conv) was the hottest item
of the b1 headline profile: 1.78 ms of 12.45 (broadcast materialization +
conv-input relayout at 352x1216).  layers._DilatedUpConv computes the same
function as ONE conv with lhs_dilation=2 and the 4x4 kernel K (*) ones(2,2)
— the upsampled tensor is never materialized.  This measures both variants'
full-model b1 DEVICE time (named program spans, one trace; see
PERFORMANCE.md measurement gotchas for why walltime is not used).

Usage: python scripts/exp_fused_upconv.py [--steps 10]
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

from bts_tpu.models.bts import BtsModel  # noqa: E402


def make_forward(fused: bool):
    model = BtsModel(
        encoder_name="densenet161_bts",
        max_depth=80.0,
        num_features=512,
        dtype=jnp.bfloat16,
        fused_upconv=fused,
    )
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 192, 3))
    )

    def fwd(params, batch_stats, images):
        *_, final = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, False
        )
        return final

    fwd.__name__ = f"fwd_upconv_{'fused' if fused else 'plain'}"
    return jax.jit(fwd), variables


def device_ms_per_program(tracedir: str, prefix: str):
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
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tracedir", default="/tmp/bts_fusedup_profile")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(1, 352, 1216, 3)).astype(np.float32))

    variants = {}
    for fused in (False, True):
        fwd, variables = make_forward(fused)
        a = (variables["params"], variables["batch_stats"], images)
        fwd(*a).block_until_ready()
        for _ in range(3):
            fwd(*a).block_until_ready()
        variants[fused] = (fwd, a)

    # numerical sanity: same params (identical trees), outputs must agree
    pf, af = variants[True]
    pp, ap_ = variants[False]
    d = float(jnp.abs(pf(*af) - pp(*af)).max())
    print(f"fused vs plain max abs depth diff (bf16 fwd, same params): {d:.5f} m")

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for fused, (fwd, a) in variants.items():
            for _ in range(args.steps):
                out = fwd(*a)
            out.block_until_ready()

    for name, (ms, n) in sorted(device_ms_per_program(args.tracedir, "jit_fwd_upconv").items()):
        per = ms / max(n, 1)
        print(f"{name}: {per:.3f} ms/step device  ({1000.0 / per:.1f} img/s)  n={n}")


if __name__ == "__main__":
    main()
