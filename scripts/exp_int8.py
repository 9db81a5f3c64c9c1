"""Experiment: int8 conv chains vs bf16 on the v5e MXU.

Gate for an int8 post-training-quantization inference path (PERFORMANCE.md
"Ceiling analysis": the b1 headline forward is bandwidth-bound at ~99% of
HBM peak; int8 activations would halve the stored-tensor traffic AND double
the MXU rate, the only remaining lever that attacks BOTH walls).  Before
building the QConv/calibration subsystem, measure the primitive: a chain of
DenseNet-interior-shaped conv+BN+ELU units, (a) bf16 end-to-end vs (b) int8
storage with s8xs8->s32 convs, requantizing in the epilogue so inter-layer
tensors are stored as int8.

If XLA-TPU silently upcasts s8 convs to bf16 this shows up as int8 >= bf16
time (the extra quantize work with no traffic/MXU win).

Methodology: DEVICE spans from jax.profiler (walltime on the tunnel is
untrustworthy in both directions — see exp_lanepad.py header).

Usage: python scripts/exp_int8.py [--steps 20]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

# DenseNet-161 block-2-ish unit: 1x1 bottleneck then 3x3 growth conv.
H, W, CIN, CMID, COUT, LAYERS = 88, 304, 384, 192, 48, 8
DN = ("NHWC", "HWIO", "NHWC")


def conv(x, k, preferred=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=preferred,
    )


def unit_bf16(x, k1, k2, g1, b1, g2, b2):
    y = conv(x, k1)
    y = jax.nn.elu(y * g1 + b1).astype(jnp.bfloat16)
    y = conv(y, k2)
    y = jax.nn.elu(y * g2 + b2).astype(jnp.bfloat16)
    return y


def quant(x, scale):
    # symmetric per-tensor: bf16 -> s8 (round-to-nearest, clip)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)


def unit_int8(x_q, sx, k1_q, sk1, k2_q, sk2, g1, b1, g2, b2):
    # s8 x s8 -> s32 conv; dequant+BN+ELU+requant epilogue (fusible, so the
    # stored inter-layer tensor is int8)
    y = conv(x_q, k1_q, preferred=jnp.int32)
    y = y.astype(jnp.float32) * (sx * sk1)
    y = jax.nn.elu(y * g1 + b1)
    sy = jnp.float32(0.05)  # static calibrated scale stand-in
    y_q = quant(y, sy)
    z = conv(y_q, k2_q, preferred=jnp.int32)
    z = z.astype(jnp.float32) * (sy * sk2)
    z = jax.nn.elu(z * g2 + b2)
    sz = jnp.float32(0.05)
    return quant(z, sz)


def make_variants(steps_unused):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, H, W, CIN)).astype(np.float32))
    k1 = jnp.asarray(rng.normal(size=(1, 1, CIN, CMID)).astype(np.float32) * 0.05)
    k2 = jnp.asarray(rng.normal(size=(3, 3, CMID, COUT)).astype(np.float32) * 0.05)
    g1, b1 = jnp.float32(1.0), jnp.float32(0.0)
    g2, b2 = jnp.float32(1.0), jnp.float32(0.0)

    def fwd_bf16(x):
        y = x.astype(jnp.bfloat16)
        k1b, k2b = k1.astype(jnp.bfloat16), k2.astype(jnp.bfloat16)
        outs = []
        for _ in range(LAYERS):
            o = unit_bf16(y[..., :CIN], k1b, k2b, g1, b1, g2, b2)
            outs.append(o)
            y = jnp.concatenate([y[..., COUT:], o], axis=-1)  # keep CIN static
        return sum(o.astype(jnp.float32).sum() for o in outs)

    sk1 = jnp.float32(float(np.abs(k1).max()) / 127.0)
    sk2 = jnp.float32(float(np.abs(k2).max()) / 127.0)
    k1_q, k2_q = quant(k1, sk1), quant(k2, sk2)

    def fwd_int8(x):
        sx = jnp.float32(0.05)
        y = quant(x, sx)
        outs = []
        for _ in range(LAYERS):
            o = unit_int8(y[..., :CIN], sx, k1_q, sk1, k2_q, sk2, g1, b1, g2, b2)
            outs.append(o)
            y = jnp.concatenate([y[..., COUT:], o], axis=-1)  # int8 concat
            sx = jnp.float32(0.05)
        return sum(o.astype(jnp.float32).sum() for o in outs)

    fwd_bf16.__name__ = "fwd_v_bf16"
    fwd_int8.__name__ = "fwd_v_int8"
    return x, {"bf16": jax.jit(fwd_bf16), "int8": jax.jit(fwd_int8)}


def device_ms_per_program(tracedir: str, prefix: str = "jit_fwd_v_"):
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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--tracedir", default="/tmp/bts_int8_profile")
    args = ap.parse_args()

    x, variants = make_variants(args.steps)
    for name, fn in variants.items():
        fn(x).block_until_ready()  # compile
        for _ in range(3):
            fn(x).block_until_ready()
        print(f"compiled {name}")

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for name, fn in variants.items():
            for _ in range(args.steps):
                out = fn(x)
            out.block_until_ready()

    for name, (ms, n) in sorted(device_ms_per_program(args.tracedir).items()):
        per = ms / max(n, 1)
        print(f"{name}: {per:.3f} ms/step device  n={n}")


if __name__ == "__main__":
    main()
