"""Experiment: cost of the full-resolution decoder TAIL, and a fused variant.

The b1 headline forward is 10.63 ms device span (round 3, after the fused
UpConv + fused LPG head).  The remaining non-conv time is materialization
spread across the net; the largest single tensors live in the decoder tail
(everything at full 352x1216 resolution after iconv2):

    upconv1 = ELU(up2x_conv(iconv2, 64->32))          # full-res 32ch
    d1x1    = sigmoid(1x1 chain 32->16->8->1)          # Reduction1x1 is_final
    concat1 = [upconv1, d1x1, d2, d4, d8]              # 36ch
    iconv1  = ELU(conv3x3 36->32)
    final   = 80 * sigmoid(conv3x3 32->1)

This script measures the tail ALONE (random weights, random inputs) as:
  - variant "xla":  the literal composition above (what the model runs today)
  - variant "xla_nod1x1": same minus the reduction chain (isolates its cost)
  - with --fused: also the phase-separated Pallas kernel
    (ops.tail_pallas — MEASURED AND REJECTED: 14.7 ms vs 3.4 ms for the
    literal tail at b1 352x1216; this flag reproduces that comparison,
    plus a numerics check of both paths against the f32 literal truth.
    NOTE the kernel's Mosaic compile takes ~14 min cold.)
Each variant's jitted program is named, one trace, DEVICE spans only
(walltime on the tunnel is untrustworthy in both directions — see
PERFORMANCE.md measurement gotchas).

Usage: python scripts/exp_tail.py [--steps 10] [--fused]
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

from bts_tpu.models.layers import _up2x_conv  # noqa: E402

H, W = 352, 1216
CIN = 64  # iconv2 channels (nf//8)
CUP = 32  # upconv1 channels (nf//16)


def make_params(rng):
    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.1)

    return {
        "k_up": t(3, 3, CIN, CUP), "b_up": t(CUP),
        "k_r1": t(1, 1, CUP, 16), "b_r1": t(16),
        "k_r2": t(1, 1, 16, 8), "b_r2": t(8),
        "k_r3": t(1, 1, 8, 1), "b_r3": t(1),
        "k_i1": t(3, 3, CUP + 4, CUP), "b_i1": t(CUP),
        "k_f": t(3, 3, CUP, 1), "b_f": t(1),
    }


def conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y + b.astype(x.dtype)


def tail_xla(p, iconv2, d2, d4, d8, with_d1x1=True):
    """The literal tail composition (mirrors BtsDecoder lines 139-154)."""
    dt = iconv2.dtype
    up1 = jax.nn.elu(_up2x_conv(iconv2, p["k_up"]) + p["b_up"].astype(dt))
    if with_d1x1:
        r = jax.nn.elu(conv(up1, p["k_r1"], p["b_r1"]))
        r = jax.nn.elu(conv(r, p["k_r2"], p["b_r2"]))
        d1x1 = jax.nn.sigmoid(conv(r, p["k_r3"], p["b_r3"]).astype(jnp.float32))
    else:
        d1x1 = d2  # placeholder map, keeps concat width identical
    cat = jnp.concatenate(
        [up1, d1x1.astype(dt), d2.astype(dt), d4.astype(dt), d8.astype(dt)], axis=-1
    )
    i1 = jax.nn.elu(conv(cat, p["k_i1"], p["b_i1"]))
    logits = conv(i1, p["k_f"], p["b_f"])
    return 80.0 * jax.nn.sigmoid(logits.astype(jnp.float32))


def device_ms_per_program(tracedir: str, prefix: str = "jit_tail"):
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
    ap.add_argument("--tracedir", default="/tmp/bts_tail_profile")
    ap.add_argument("--fused", action="store_true",
                    help="also measure the (rejected) Pallas tail kernel")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    p = make_params(rng)
    iconv2_f32 = jnp.asarray(
        rng.normal(size=(1, H // 2, W // 2, CIN)).astype(np.float32)
    )
    iconv2 = iconv2_f32.astype(jnp.bfloat16)
    maps = [
        jnp.asarray(rng.uniform(0.1, 1.0, (1, H, W, 1)).astype(np.float32)) for _ in range(3)
    ]

    def tail_full(p, iconv2, d2, d4, d8):
        return tail_xla(p, iconv2, d2, d4, d8, True)

    def tail_nod1x1(p, iconv2, d2, d4, d8):
        return tail_xla(p, iconv2, d2, d4, d8, False)

    fns = [tail_full, tail_nod1x1]
    if args.fused:
        from bts_tpu.ops.tail_pallas import fused_tail, interleave2x2

        kp = {
            "up": {"kernel": p["k_up"], "bias": p["b_up"]},
            "r1": {"kernel": p["k_r1"], "bias": p["b_r1"]},
            "r2": {"kernel": p["k_r2"], "bias": p["b_r2"]},
            "r3": {"kernel": p["k_r3"], "bias": p["b_r3"]},
            "i1": {"kernel": p["k_i1"], "bias": p["b_i1"]},
            "f": {"kernel": p["k_f"], "bias": p["b_f"]},
        }
        # the kernel consumes PHASE-SPLIT guidance planes; deinterleave the
        # full-res maps (inverse of interleave2x2)
        def phase_split(m):
            b, hh2, ww2 = m.shape[0], m.shape[1] // 2, m.shape[2] // 2
            return (
                m[..., 0]
                .reshape(b, hh2, 2, ww2, 2)
                .transpose(0, 2, 4, 1, 3)
                .reshape(b, 4, hh2, ww2)
            )

        def tail_fused(p, iconv2, d2, d4, d8):
            phs = [phase_split(m) for m in (d2, d4, d8)]
            fin_ph, _ = fused_tail(iconv2, *phs, kp)
            return 80.0 * interleave2x2(fin_ph)[..., None]

        fns.append(tail_fused)

        # numerics: both bf16 paths against the f32 literal truth
        truth = np.asarray(jax.jit(
            lambda: tail_xla(p, iconv2_f32, *maps, True))())
        for name, fn in (("lit", tail_full), ("fus", tail_fused)):
            got = np.asarray(jax.jit(fn)(p, iconv2, *maps))
            err = np.abs(got - truth)
            print(f"{name} vs f32 truth: max {err.max():.4f} mean {err.mean():.2e}")

    variants = {}
    for fn in fns:
        fn.__name__ = "tail_" + fn.__name__.split("_", 1)[1]
        j = jax.jit(fn)
        j(p, iconv2, *maps).block_until_ready()
        for _ in range(3):
            j(p, iconv2, *maps).block_until_ready()
        variants[fn.__name__] = j

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for name, j in variants.items():
            for _ in range(args.steps):
                out = j(p, iconv2, *maps)
            out.block_until_ready()

    for name, (ms, n) in sorted(device_ms_per_program(args.tracedir).items()):
        print(f"{name}: {ms / max(n, 1):.3f} ms/step device  n={n}")


if __name__ == "__main__":
    main()
