"""Experiment: XLA AUTO param/output layouts for the b1 headline forward.

The remaining gap between the 10.63 ms b1 forward and the ~230 img/s
materialization-free bound is attributed (PERFORMANCE.md "Where the time
goes") to relayout copies XLA inserts around the decoder's concat pyramid
and around parameters whose default (row-major) host layout differs from
what the conv kernels want.  The one untried toolchain lever is the JAX
layouts API: compile the program with ``Format(Layout.AUTO)`` on inputs
and outputs so XLA *chooses* the parameter layouts, then ``device_put``
the weights into exactly those layouts ahead of dispatch — pre-packing
them once instead of paying a relayout (or a strided read) every step.

Three variants, one trace, device spans only (tunnel walltime lies in
both directions — see CLAUDE.md):

  default   — params in default layouts, plain jit (the shipped path)
  auto      — params device_put into XLA's chosen input layouts, program
              compiled with AUTO in/out formats
  auto_in   — AUTO input layouts only (outputs default): isolates whether
              any win comes from input pre-packing vs output repacking

Usage: python scripts/exp_layouts.py [--steps 20] [--batch 1]
Writes LAYOUTS_EXP.json next to the repo's other experiment artifacts.
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
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from jax.experimental.layout import Format, Layout  # noqa: E402

from bts_tpu.models.bts import BtsModel  # noqa: E402


def build(batch: int):
    model = BtsModel(
        encoder_name="densenet161_bts",
        max_depth=80.0,
        num_features=512,
        dtype=jnp.bfloat16,
        use_pallas="auto",
    )
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((batch, 96, 192, 3))
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(batch, 352, 1216, 3)).astype(np.float32))

    def fwd(params, batch_stats, images):
        *_, final = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, False
        )
        return final

    return fwd, variables, images


def jit_variant(fwd, name: str, in_fmt, out_fmt):
    f = lambda p, b, x: fwd(p, b, x)  # noqa: E731 - fresh identity for naming
    f.__name__ = name
    kw = {}
    if in_fmt is not None:
        kw["in_shardings"] = in_fmt
    if out_fmt is not None:
        kw["out_shardings"] = out_fmt
    return jax.jit(f, **kw)


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
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tracedir", default="/tmp/bts_layouts_profile")
    args = ap.parse_args()

    fwd, variables, images = build(args.batch)
    base_args = (variables["params"], variables["batch_stats"], images)

    variants = {}

    # ---- default: the shipped path ----
    f_def = jit_variant(fwd, "fwd_default", None, None)
    f_def(*base_args).block_until_ready()
    variants["default"] = (f_def, base_args)

    # AUTO layouts require lowering on avals (ShapeDtypeStruct), then
    # executing the COMPILED object on arrays device_put into the layouts
    # XLA chose.
    avals = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), base_args
    )

    # ---- auto: XLA picks in+out layouts; params pre-packed to match ----
    auto = Format(Layout.AUTO)
    f_auto = jit_variant(fwd, "fwd_auto", auto, auto)
    compiled = f_auto.lower(*avals).compile()
    in_fmts = compiled.input_formats[0]  # (args, kwargs) -> args pytree of Format
    packed = jax.tree.map(jax.device_put, base_args, in_fmts)
    jax.block_until_ready(packed)
    # how many params did XLA actually want in a non-default layout?
    n_total = len(jax.tree.leaves(in_fmts))
    n_custom = sum(
        1
        for fmt, leaf in zip(jax.tree.leaves(in_fmts), jax.tree.leaves(base_args))
        if fmt.layout is not None
        and fmt.layout.major_to_minor != tuple(range(np.ndim(leaf)))
    )
    print(f"[layouts] XLA chose non-row-major layouts for {n_custom}/{n_total} inputs")
    compiled(*packed).block_until_ready()
    variants["auto"] = (compiled, packed)

    # ---- auto_in: inputs AUTO, outputs default ----
    f_ain = jit_variant(fwd, "fwd_autoin", auto, None)
    c_ain = f_ain.lower(*avals).compile()
    packed_in = jax.tree.map(jax.device_put, base_args, c_ain.input_formats[0])
    jax.block_until_ready(packed_in)
    c_ain(*packed_in).block_until_ready()
    variants["auto_in"] = (c_ain, packed_in)

    # numerical sanity: same program, same weights, same answer
    ref = np.asarray(f_def(*base_args), np.float32)
    for name, (f, a) in variants.items():
        got = np.asarray(f(*a), np.float32)
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=1e-2, err_msg=name)

    for f, a in variants.values():  # warm past per-process first-exec artifact
        for _ in range(3):
            f(*a).block_until_ready()

    os.makedirs(args.tracedir, exist_ok=True)
    with jax.profiler.trace(args.tracedir):
        for name, (f, a) in variants.items():
            for _ in range(args.steps):
                out = f(*a)
            out.block_until_ready()

    spans = device_ms_per_program(args.tracedir)
    result = {"batch": args.batch, "steps": args.steps, "custom_layout_inputs": n_custom}
    for name, (ms, n) in sorted(spans.items()):
        per = ms / max(n, 1)
        print(f"{name}: {per:.3f} ms/step device  ({args.batch * 1000.0 / per:.1f} img/s)  n={n}")
        result[name] = {"ms_per_step": per, "n": n}
    with open(os.path.join(REPO, "LAYOUTS_EXP.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
