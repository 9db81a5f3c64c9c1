"""Experiment: XLA-TPU compiler-option sweep on the b1 headline forward.

PERFORMANCE.md's ceiling analysis concludes the remaining b1 gap (10.6 ms
measured vs ~4.3 ms conv compute) is materialization the *toolchain*
chooses — layout copies, concat materialization, fusion boundaries — after
the kernel-level levers (fused UpConv, fused LPG head, Pallas tail) were
measured to exhaustion.  This sweep probes the toolchain directly: the
same forward program compiled under different XLA-TPU backend options via
`jax.jit(compiler_options=...)` (which rides the PJRT compile request, so
it works through the axon tunnel where process-env XLA_FLAGS would not
reach the remote compiler).

Options probed (public knobs; unknown ones are skipped gracefully):
  - xla_tpu_scoped_vmem_limit_kib: raises the VMEM budget the fusion cost
    model may assume -> bigger fusions, fewer HBM roundtrips.
  - xla_tpu_enable_latency_hiding_scheduler: scheduling (mostly collectives,
    expected neutral at 1 chip -- included as a control).
  - misc fusion toggles (dot_dot, aggressive loop fusion) if accepted.

Methodology: DEVICE spans from one jax.profiler trace, one named jitted
program per variant (walltime on the tunnel is untrustworthy in BOTH
directions -- see PERFORMANCE.md "Measurement gotchas").

RESULT (2026-08-18, recorded in PERFORMANCE.md "Tried and rejected"):
base 10.86 ms; vmem32m neutral; vmem64m 7% WORSE; aggressive_loop_fusion
crashes the compile helper; lhs/dotdot/rwboff produce byte-identical
executables (device events carry base's program fingerprint — the
options are no-ops for this program).  No options adopted; the trace
itself distinguishes "accepted but no-op" (fingerprint merge) from
"changed codegen" (distinct fingerprint), which is worth keeping in
mind when sweeping XLA flags through a cache-keyed toolchain.

Usage: python scripts/exp_xla_opts.py [--steps 20]
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

# (tag, options-dict).  Tags become program names: jit_fwd_<tag>.
CANDIDATES = [
    ("base", None),
    ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("lhs", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("dotdot", {"xla_tpu_dot_dot_fusion": "true"}),
    ("aggloop", {"xla_tpu_enable_aggressive_loop_fusion": "true"}),
    ("rwboff", {"xla_tpu_rwb_fusion": "false"}),
]


def make_model():
    return BtsModel(
        encoder_name="densenet161_bts",
        max_depth=80.0,
        num_features=512,
        dtype=jnp.bfloat16,
        use_pallas="auto",
    )


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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--tracedir", default="/tmp/bts_xlaopts_profile")
    args = ap.parse_args()

    model = make_model()
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 192, 3))
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(1, 352, 1216, 3)).astype(np.float32))
    a = (variables["params"], variables["batch_stats"], images)

    variants = {}
    for tag, opts in CANDIDATES:
        def fwd(params, batch_stats, images):
            *_, final = model.apply(
                {"params": params, "batch_stats": batch_stats}, images, False
            )
            return final

        fwd.__name__ = f"fwd_{tag}"
        jitted = jax.jit(fwd, compiler_options=opts)
        try:
            jitted(*a).block_until_ready()  # compile + first run
        except Exception as e:  # unknown option, compiler rejection, ...
            print(f"{tag}: SKIPPED ({type(e).__name__}: {str(e)[:160]})")
            continue
        for _ in range(3):
            jitted(*a).block_until_ready()
        variants[tag] = jitted
        print(f"{tag}: compiled ok")

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for tag, jitted in variants.items():
            for _ in range(args.steps):
                out = jitted(*a)
            out.block_until_ready()

    for name, (ms, n) in sorted(device_ms_per_program(args.tracedir, "jit_fwd_").items()):
        per = ms / max(n, 1)
        print(f"{name}: {per:.3f} ms/step device  ({1000.0 / per:.1f} img/s)  n={n}")


if __name__ == "__main__":
    main()
