"""Ground-truth per-op TPU timing via jax.profiler trace parsing.

cost_analysis() "bytes accessed" double-counts fused operands, and the HLO
text lists virtual (fused) ops — neither tells where step time actually
goes.  This profiles N steps of the headline forward (or --train step),
then parses the chrome-trace JSON the profiler writes and aggregates XLA op
durations on the TPU device track.

Usage: python scripts/profile_ops.py [--train] [--remat] [--steps 5] [--top 25]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np


def run_workload(train: bool, remat: bool, steps: int, tracedir: str, batch: int = 16,
                 encoder: str = "densenet161_bts", dataset: str = "kitti"):
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    from bts_tpu.data.augment import eval_preprocess
    from bts_tpu.models import BtsModel

    platform = jax.devices()[0].platform
    dtype = jnp.bfloat16 if platform in ("tpu", "axon") else jnp.float32
    rng = np.random.default_rng(0)
    small = jnp.zeros((1, 96, 192, 3), jnp.float32)

    if train:
        from bts_tpu.config import Config
        from bts_tpu.models import create_model
        from bts_tpu.training.optimizer import make_optimizer
        from bts_tpu.training.trainer import TrainState, make_train_step

        kitti = dataset == "kitti"
        cfg = Config(dataset=dataset, encoder=encoder,
                     max_depth=80.0 if kitti else 10.0,
                     input_height=352 if kitti else 416,
                     input_width=704 if kitti else 544, batch_size=batch,
                     do_random_rotate=True, degree=1.0 if kitti else 2.5,
                     remat=remat,
                     compute_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32")
        model = create_model(cfg)
        tx = make_optimizer(cfg, total_steps=1000)
        variables = jax.jit(lambda k, xx: model.init(k, xx, True))(jax.random.PRNGKey(0), small)
        state = TrainState.create(variables, tx)
        ph, pw = (352, 1216) if kitti else (480, 640)
        batch = {
            "image": jnp.asarray(rng.integers(0, 255, (batch, ph, pw, 3), np.uint8)),
            "depth": jnp.asarray(rng.uniform(0.5, 60.0, (batch, ph, pw)).astype(np.float32)),
            "focal": jnp.full((batch,), 721.5377 if kitti else 518.8579, jnp.float32),
        }
        step = make_train_step(model, tx, cfg, mesh=None, augment=True)
        key = jax.random.PRNGKey(0)
        state, _ = step(state, batch, key)
        jax.block_until_ready(state)
        with jax.profiler.trace(tracedir):
            for _ in range(steps):
                state, _ = step(state, batch, key)
            jax.block_until_ready(state)
    else:
        model = BtsModel(encoder_name="densenet161_bts", max_depth=80.0,
                         num_features=512, dtype=dtype)
        x = jnp.asarray(rng.integers(0, 255, (1, 352, 1216, 3), np.uint8))
        variables = jax.jit(lambda k, xx: model.init(k, xx, False))(jax.random.PRNGKey(0), small)
        f = jax.jit(lambda xx: model.apply(variables, eval_preprocess(xx), False)[-1])
        f(x).block_until_ready()
        with jax.profiler.trace(tracedir):
            for _ in range(steps):
                out = f(x)
            out.block_until_ready()


def parse_trace(tracedir: str, steps: int, top: int):
    paths = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace.json.gz found under", tracedir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid names containing "TPU"/"Device"; aggregate complete
    # events ("ph" == "X") by name
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            agg[name] += dur
            cnt[name] += 1
            total += dur
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"trace: {path}")
    print(f"total device op time: {total/1e3:.2f} ms over {steps} steps "
          f"(includes nested/step spans; ms/step below = total/steps, only "
          f"meaningful when n == steps)")
    for name, dur in rows[:top]:
        print(f"  {dur/1e3/steps:8.3f} ms/step  {100*dur/max(total,1e-9):5.1f}%  "
              f"n={cnt[name]:3d}  {name[:90]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--encoder", default="densenet161_bts")
    ap.add_argument("--dataset", default="kitti")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--tracedir", default="/tmp/bts_profile")
    ap.add_argument("--parse_only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        os.makedirs(args.tracedir, exist_ok=True)
        run_workload(args.train, args.remat, args.steps, args.tracedir, args.batch,
                     args.encoder, args.dataset)
    parse_trace(args.tracedir, args.steps, args.top)


if __name__ == "__main__":
    main()
