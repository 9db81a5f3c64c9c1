"""Experiment: lane-pad the 1-ch LPG guidance maps before decoder concats.

Targets the measured relayout-copy tax of the b1 headline forward
(PERFORMANCE.md "Where the time goes": 2.6 ms/step of copy.*, of which the
1-channel f32 guidance maps relayout at ~9 GB/s before each concat).
Hypothesis: zero-padding each map to 8 (or 16) lanes makes every concat
operand lane-tile-aligned, so XLA emits aligned copies instead of
single-lane shuffles.  Cost: the consuming convs' cin grows by 7/15 per
map (extra MACs on zeros).

Methodology: DEVICE time from jax.profiler traces, NOT walltime — on the
axon tunnel walltime readings have been observed both ~10x slow (the
first-executable artifact) and ~15x FAST (async completion artifact,
2026-08-17: an args-style forward "measured" 0.9 ms walltime while its
profiler device span was 14 ms).  Each variant's jitted program gets a
distinct name so one trace yields per-variant device ms/step.

Usage: python scripts/exp_lanepad.py [--pads 0,8,16] [--steps 10]
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


def make_forward(lane_pad: int):
    model = BtsModel(
        encoder_name="densenet161_bts",
        max_depth=80.0,
        num_features=512,
        dtype=jnp.bfloat16,
        use_pallas="auto",
        lane_pad=lane_pad,
    )
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 192, 3))
    )

    def fwd(params, batch_stats, images):
        *_, final = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, False
        )
        return final

    fwd.__name__ = f"fwd_pad{lane_pad}"  # names the device program span
    return jax.jit(fwd), variables


def device_ms_per_program(tracedir: str):
    """Aggregate device-track span durations by program name."""
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
            if name.startswith("jit_fwd_pad"):
                agg[name] += float(e.get("dur", 0.0))
                cnt[name] += 1
    return {n: (agg[n] / 1e3, cnt[n]) for n in agg}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pads", default="0,8")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--tracedir", default="/tmp/bts_lanepad_profile")
    args = ap.parse_args()
    pads = [int(p) for p in args.pads.split(",")]

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(1, 352, 1216, 3)).astype(np.float32))

    variants = {}
    for p in pads:
        fwd, variables = make_forward(p)
        a = (variables["params"], variables["batch_stats"], images)
        fwd(*a).block_until_ready()  # compile + warm
        for _ in range(3):
            fwd(*a).block_until_ready()
        variants[p] = (fwd, a)

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for p, (fwd, a) in variants.items():
            for _ in range(args.steps):
                out = fwd(*a)
            out.block_until_ready()

    for name, (ms, n) in sorted(device_ms_per_program(args.tracedir).items()):
        per = ms / max(n, 1)
        print(f"{name}: {per:.3f} ms/step device  ({1000.0 / per:.1f} img/s)  n={n}")


if __name__ == "__main__":
    main()
