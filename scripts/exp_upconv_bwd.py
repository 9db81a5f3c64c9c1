"""UpConv backward-lowering experiment on config 4 (DenseNet-161 b16 train).

Variants (bts_tpu/models/layers.py::_DilatedUpConv.bwd):
  literal - custom_vjp that differentiates the two-op up2x+conv composition
            (GSPMD-proven under spatial sharding; re-materializes the
            full-res upsampled tensor in the backward)
  dilated - plain AD of the lhs-dilated conv (dx = strided conv of the
            cotangent, dK = dilated-input x cotangent conv; the full-res
            intermediate is never built)

Device ms/step per variant from named program spans in one trace (tunnel
walltime is unreliable in both directions — PERFORMANCE.md gotchas).

Usage: python scripts/exp_upconv_bwd.py [--steps 5] [--batch 16]
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

from bts_tpu.config import Config  # noqa: E402
from bts_tpu.models import create_model  # noqa: E402
from bts_tpu.training.optimizer import make_optimizer  # noqa: E402
from bts_tpu.training.trainer import TrainState, make_train_step  # noqa: E402


def make_step(bwd: str, batch: int):
    cfg = Config(
        dataset="kitti", encoder="densenet161_bts", max_depth=80.0,
        input_height=352, input_width=704, batch_size=batch,
        do_random_rotate=True, degree=1.0, remat=True,
        compute_dtype="bfloat16",
    )
    model = create_model(cfg).clone(upconv_bwd=bwd)
    tx = make_optimizer(cfg, total_steps=1000)
    variables = jax.jit(lambda k, x: model.init(k, x, True))(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 192, 3))
    )
    state = TrainState.create(variables, tx)
    raw = make_train_step(model, tx, cfg, mesh=None, augment=True)

    def step(state, batch, key):
        return raw(state, batch, key)

    step.__name__ = f"trainstep_{bwd}"
    return jax.jit(step, donate_argnums=(0,)), state


def device_ms(tracedir: str, prefix: str):
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
    ap.add_argument("--variants", default="literal,dilated")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tracedir", default="/tmp/bts_upconvbwd_profile")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    host_batch = {
        "image": jnp.asarray(rng.integers(0, 255, (args.batch, 352, 1216, 3), np.uint8)),
        "depth": jnp.asarray(rng.uniform(0.5, 60.0, (args.batch, 352, 1216)).astype(np.float32)),
        "focal": jnp.full((args.batch,), 721.5377, jnp.float32),
    }
    key = jax.random.PRNGKey(0)

    variants = {}
    for bwd in args.variants.split(","):
        try:
            step, state = make_step(bwd, args.batch)
            state, metrics = step(state, host_batch, key)  # compile + warm
            jax.block_until_ready(state)
            print(f"{bwd}: compiled, loss={float(metrics['loss']):.4f}")
            variants[bwd] = (step, state)
        except Exception as e:
            print(f"{bwd}: FAILED - {type(e).__name__}: {str(e)[:300]}")

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for bwd, (step, state) in variants.items():
            for _ in range(args.steps):
                state, metrics = step(state, host_batch, key)
            jax.block_until_ready(state)
            variants[bwd] = (step, state)

    for name, (ms, n) in sorted(device_ms(args.tracedir, "jit_trainstep").items()):
        per = ms / max(n, 1)
        print(f"{name}: {per:.1f} ms/step device  ({args.batch * 1000.0 / per:.1f} img/s)  n={n}")


if __name__ == "__main__":
    main()
