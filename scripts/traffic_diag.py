"""Localize HBM traffic in the headline b1 forward (DenseNet-161, 352x1216).

MFU.json reports ~9.8 GB bytes-accessed per batch-1 forward where a naive
activation estimate is ~1 GB; this script cost-analyzes the encoder alone,
the decoder alone, and the full model (optionally at two widths) to find
where the traffic lives, and prints the top fusions by bytes from the
optimized HLO when --hlo is given.

Usage: python scripts/traffic_diag.py [--width 1216] [--hlo]
"""
from __future__ import annotations

import argparse
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def analyze(fn, *args, label: str, show_hlo: bool = False):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    by = float(ca.get("bytes accessed", 0.0))
    print(f"{label:28s} flops={flops/1e9:9.1f} G  bytes={by/1e9:7.2f} GB  "
          f"arith_intensity={flops/max(by,1):.1f}")
    if show_hlo:
        txt = compiled.as_text()
        # rank ops by output buffer size: f32[...]/bf16[...] shapes
        sizes = []
        for m in re.finditer(r"^\s*%?([\w.-]+) = (\w+)\[([\d,]*)\]", txt, re.M):
            name, dt, dims = m.groups()
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            bpe = {"f32": 4, "bf16": 2, "u8": 1, "s32": 4, "pred": 1, "f16": 2}.get(dt, 4)
            sizes.append((n * bpe, name, dt, dims))
        sizes.sort(reverse=True)
        print("  top-12 result buffers:")
        for sz, name, dt, dims in sizes[:12]:
            print(f"    {sz/1e6:8.1f} MB  {dt}[{dims}]  {name[:70]}")
    return flops, by


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--hlo", action="store_true")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    from bts_tpu.data.augment import eval_preprocess
    from bts_tpu.models import BtsModel
    from bts_tpu.models.bts import BtsDecoder
    from bts_tpu.models.encoders import build_encoder

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (1, args.height, args.width, 3), np.uint8))
    small = jnp.zeros((1, 96, 192, 3), jnp.float32)

    model = BtsModel(encoder_name="densenet161_bts", max_depth=80.0,
                     num_features=512, dtype=dtype)
    variables = jax.jit(lambda k, xx: model.init(k, xx, False))(jax.random.PRNGKey(0), small)

    analyze(lambda xx: model.apply(variables, eval_preprocess(xx), False)[-1],
            x, label="full forward", show_hlo=args.hlo)

    enc = build_encoder("densenet161_bts", dtype=dtype)
    enc_vars = jax.jit(lambda k, xx: enc.init(k, xx, False))(jax.random.PRNGKey(0), small)
    feats = jax.jit(lambda xx: enc.apply(enc_vars, eval_preprocess(xx).astype(dtype), False))(x)
    analyze(lambda xx: enc.apply(enc_vars, eval_preprocess(xx).astype(dtype), False)[-1],
            x, label="encoder only", show_hlo=args.hlo)

    dec = BtsDecoder(max_depth=80.0, num_features=512, dtype=dtype)
    # init on a consistent tiny pyramid (decoder params are H/W-independent)
    tiny_feats = jax.jit(lambda xx: enc.apply(enc_vars, xx.astype(dtype), False))(small)
    dec_vars = jax.jit(lambda k, ff: dec.init(k, ff, False))(jax.random.PRNGKey(0), tiny_feats)
    analyze(lambda ff: dec.apply(dec_vars, ff, False)[-1],
            feats, label="decoder only", show_hlo=args.hlo)


if __name__ == "__main__":
    main()
