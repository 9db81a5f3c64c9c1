"""Measure all five BASELINE.json benchmark configs; one JSON line each.

Configs (BASELINE.json "configs"):
  1. MobileNetV2, single 480x640 NYU image inference on CPU (f32)
  2. DenseNet-161 KITTI eval at 352x1216, KB-crop, batch 1 (= bench.py)
  3. ResNeXt-101 NYU training step, batch 4, silog, bf16 (416x544)
  4. DenseNet-161 + LPG KITTI training, batch 16 data-parallel (--remat)
  5. Streaming multi-clip KITTI inference, batch 8, fused preprocessing

Each config runs in a subprocess so platform choice (CPU for #1, TPU
otherwise) and memory are isolated.  Results append to BENCH_SUITE.json.

Usage: python scripts/bench_suite.py [--configs 1,2,3,4,5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SNIPPETS = {
    1: """
import jax
jax.config.update("jax_platforms", "cpu")
import time, numpy as np, jax.numpy as jnp
from bts_tpu.models import BtsModel
from bts_tpu.data.augment import eval_preprocess
model = BtsModel(encoder_name="mobilenetv2_bts", max_depth=10.0, num_features=512, dtype=jnp.float32)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0,255,(1,480,640,3),dtype=np.uint8))
v = jax.jit(lambda k, xx: model.init(k, xx, False))(jax.random.PRNGKey(0), jnp.zeros((1,96,192,3)))
fwd = jax.jit(lambda xx: model.apply(v, eval_preprocess(xx), False)[-1])
fwd(x).block_until_ready()
t0=time.perf_counter(); n=10
for _ in range(n): out = fwd(x)
out.block_until_ready()
ips = n/(time.perf_counter()-t0)
print(json.dumps({"config": 1, "metric": "mobilenetv2_nyu_480x640_cpu_infer", "value": round(ips,3), "unit": "images/sec"}))
""",
    3: """
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", REPO + "/.jax_cache")
from bts_tpu.config import Config
from bts_tpu.models import create_model
from bts_tpu.training.optimizer import make_optimizer
from bts_tpu.training.trainer import TrainState, make_train_step
cfg = Config(dataset="nyu", encoder="resnext101_bts", max_depth=10.0, bts_size=512,
             input_height=416, input_width=544, batch_size=4, compute_dtype="bfloat16",
             do_random_rotate=True, degree=2.5)
model = create_model(cfg)  # the real CLI model (picks up the dilated UpConv bwd)
rng = np.random.default_rng(0); B=4
v = jax.jit(lambda k, x: model.init(k, x, True))(jax.random.PRNGKey(0), jnp.zeros((B,96,192,3)))
tx = make_optimizer(cfg, 1000)
state = TrainState.create(v, tx)
step = make_train_step(model, tx, cfg, mesh=None, augment=True)
batch = {"image": jnp.asarray(rng.integers(0,255,(B,427,565,3),dtype=np.uint8)),
         "depth": jnp.asarray(rng.uniform(0.2,9.5,(B,427,565)).astype(np.float32)),
         "focal": jnp.full((B,),518.8579,jnp.float32)}
state, m = step(state, batch, jax.random.PRNGKey(0)); jax.block_until_ready(m)
t0=time.perf_counter(); n=10
for _ in range(n): state, m = step(state, batch, jax.random.PRNGKey(0))
jax.block_until_ready(m)
ips = B*n/(time.perf_counter()-t0)
print(json.dumps({"config": 3, "metric": "resnext101_nyu_416x544_b4_bf16_train", "value": round(ips,3), "unit": "images/sec/chip"}))
""",
    4: """
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", REPO + "/.jax_cache")
from bts_tpu.config import Config
from bts_tpu.models import create_model
from bts_tpu.parallel.mesh import create_mesh, replicated_sharding, shard_batch
from bts_tpu.training.optimizer import make_optimizer
from bts_tpu.training.trainer import TrainState, make_train_step
cfg = Config(dataset="kitti", encoder="densenet161_bts", max_depth=80.0, bts_size=512,
             input_height=352, input_width=704, batch_size=16, compute_dtype="bfloat16",
             do_random_rotate=True, degree=1.0, remat=True)
model = create_model(cfg)  # the real CLI model (picks up the dilated UpConv bwd)
rng = np.random.default_rng(0); B=16
mesh = create_mesh()  # all visible chips on the data axis (1 here)
v = jax.jit(lambda k, x: model.init(k, x, True))(jax.random.PRNGKey(0), jnp.zeros((B,96,192,3)))
tx = make_optimizer(cfg, 1000)
state = jax.device_put(TrainState.create(v, tx), replicated_sharding(mesh))
step = make_train_step(model, tx, cfg, mesh=mesh, augment=True)
batch = shard_batch({"image": rng.integers(0,255,(B,376,740,3),dtype=np.uint8).astype(np.uint8),
         "depth": rng.uniform(1.2,79,(B,376,740)).astype(np.float32),
         "focal": np.full((B,),715.0873,np.float32)}, mesh)
state, m = step(state, batch, jax.random.PRNGKey(0)); jax.block_until_ready(m)
t0=time.perf_counter(); n=10
for _ in range(n): state, m = step(state, batch, jax.random.PRNGKey(0))
jax.block_until_ready(m)
ips = B*n/(time.perf_counter()-t0)
print(json.dumps({"config": 4, "metric": "densenet161_kitti_352x704_b16_dp_remat_train", "value": round(ips,3), "unit": "images/sec/mesh", "devices": len(jax.devices())}))
""",
    5: """
# Device-span measurement: tunnel walltime is untrustworthy in BOTH
# directions (PERFORMANCE.md gotchas; a round-3 run of the old walltime
# form read 153k img/s — block_until_ready returned before the device
# finished).  ips comes from the jit_fwd_stream spans in a profiler trace.
import glob, gzip, os, numpy as np, jax, jax.numpy as jnp
from collections import defaultdict
jax.config.update("jax_compilation_cache_dir", REPO + "/.jax_cache")
from bts_tpu.models import BtsModel
from bts_tpu.data.augment import eval_preprocess
model = BtsModel(encoder_name="densenet161_bts", max_depth=80.0, num_features=512, dtype=jnp.bfloat16)
# B=24: measured optimum of the b1..b32 sweep (scripts/exp_batch_sweep.py,
# PERFORMANCE.md): 108 img/s at b8 -> 119.6 at b16 -> 123.7 at b24; b32 OOMs
rng = np.random.default_rng(0); B=24
x = jnp.asarray(rng.integers(0,255,(B,352,1216,3),dtype=np.uint8))
v = jax.jit(lambda k, xx: model.init(k, xx, False))(jax.random.PRNGKey(0), jnp.zeros((1,96,192,3)))
def fwd_stream(xx):
    return model.apply(v, eval_preprocess(xx), False)[-1]
fwd = jax.jit(fwd_stream)
for _ in range(3): fwd(x).block_until_ready()
tracedir = "/tmp/bts_suite5_trace"; n = 15
os.makedirs(tracedir, exist_ok=True)
with jax.profiler.trace(tracedir):
    for _ in range(n): out = fwd(x)
    out.block_until_ready()
path = max(glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True), key=os.path.getmtime)
with gzip.open(path, "rt") as f:
    events = json.load(f).get("traceEvents", [])
pid_names = {e.get("pid"): e.get("args", {}).get("name", "") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
dev_pids = {p for p, nm in pid_names.items() if "TPU" in nm or "/device" in nm.lower()}
tot, cnt = 0.0, 0
for e in events:
    if e.get("ph") == "X" and e.get("pid") in dev_pids and e.get("name", "").startswith("jit_fwd_stream"):
        tot += float(e.get("dur", 0.0)); cnt += 1
assert cnt >= n, (cnt, n)
ms = tot / 1e3 / cnt
ips = B / ms * 1e3
print(json.dumps({"config": 5, "metric": "densenet161_kitti_352x1216_b24_streaming_infer", "value": round(ips,3), "unit": "images/sec/chip", "device_ms_per_batch": round(ms,3)}))
""",
}


def run_config(c: int) -> dict:
    if c == 2:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        d["config"] = 2
        return d
    code = "import json\nREPO = " + repr(REPO) + "\nimport sys; sys.path.insert(0, REPO)\n" + SNIPPETS[c]
    out = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=3600)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        return {"config": c, "error": (out.stderr or out.stdout)[-500:]}
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    args = ap.parse_args()
    path = os.path.join(REPO, "BENCH_SUITE.json")
    # Merge with any previously measured configs so partial --configs runs
    # never clobber the suite file (driver-facing measurements must merge).
    merged: dict[int, dict] = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                for r in json.load(f):
                    merged[int(r["config"])] = r
        except (json.JSONDecodeError, KeyError, ValueError):
            pass
    # BENCH_SUITE.json keeps only the latest value per config; the append-only
    # history preserves every measurement so a silent regression inside the
    # run-to-run noise band (e.g. config 1's 0.31-0.44 CPU spread) stays
    # visible across rounds.
    # Git policy: BENCH_HISTORY.jsonl is COMMITTED — it is the cross-round
    # regression record (BENCH_SUITE.json only keeps the latest value).
    hist = os.path.join(REPO, "BENCH_HISTORY.jsonl")
    for c in [int(x) for x in args.configs.split(",")]:
        r = run_config(c)
        print(json.dumps(r), flush=True)
        merged[c] = r
        if "value" in r:  # failed runs never pollute the history consumers parse
            check_regression(hist, c, r)
            with open(hist, "a") as f:
                f.write(json.dumps({"ts": time.time(), **r}) + "\n")
        else:
            print(f"[bench_suite] config {c} errored; not recorded in history", flush=True)
    with open(path, "w") as f:
        json.dump([merged[c] for c in sorted(merged)], f, indent=1)


def check_regression(hist: str, c: int, r: dict, threshold: float = 0.05) -> bool:
    """Warn when a config regresses >5% below its history median (all suite
    metrics are higher-is-better img/s).  Mixed-method records (walltime vs
    device-span, see the 'method' field) are compared within-method only."""
    if not os.path.exists(hist):
        return False
    prior = []
    with open(hist) as f:
        for line in f:
            try:
                h = json.loads(line)
            except json.JSONDecodeError:
                continue
            if h.get("config") == c and "value" in h and h.get("method") == r.get("method"):
                prior.append(float(h["value"]))
    if not prior:
        return False
    med = sorted(prior)[len(prior) // 2]
    if float(r["value"]) < med * (1.0 - threshold):
        print(
            f"[bench_suite] WARNING: config {c} = {r['value']} is "
            f"{(1 - float(r['value']) / med) * 100:.1f}% below its history "
            f"median {med} ({len(prior)} runs) — possible regression",
            flush=True,
        )
        return True
    return False


if __name__ == "__main__":
    main()
