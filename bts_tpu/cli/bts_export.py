"""Serving export driver: checkpoint -> serialized StableHLO inference fn.

A TPU-native serving extension with no reference counterpart (the reference
lineage stops at the batch test driver, SURVEY.md §2.2): restores a
checkpoint, closes the weights over the same forward the test driver runs
(``eval_preprocess`` + model apply + KITTI focal scaling), and serializes it
with ``jax.export`` — StableHLO plus calling convention, loadable by any
jax process (see ``utils/serving.py``) without bts_tpu, the checkpoint
format, or the model code.

    python -m bts_tpu.cli.bts_export @arguments/arguments_test_eigen.txt \
        --export_path model.stablehlo [--export_platforms tpu,cpu]

The exported signature mirrors serving reality: uint8 images
(B, input_height, input_width, 3) [+ per-sample focal for KITTI] ->
(B, H, W, 1) f32 depth in meters.  Batch size is the static
``--batch_size`` (TPU serving wants static shapes; export several batch
sizes if needed — artifacts are a few MB of weights each).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.config import parse_args
from bts_tpu.data.augment import eval_preprocess
from bts_tpu.models import create_model


def build_serve_fn(cfg, state):
    """The serving closure: weights baked in, same math as bts_test."""
    model = create_model(cfg)
    use_focal = cfg.dataset == "kitti"
    params, batch_stats = state.params, state.batch_stats

    if use_focal:

        def serve(images_u8, focal):
            *_, final = model.apply(
                {"params": params, "batch_stats": batch_stats},
                eval_preprocess(images_u8), False, focal=focal,
            )
            return final

    else:

        def serve(images_u8):
            *_, final = model.apply(
                {"params": params, "batch_stats": batch_stats},
                eval_preprocess(images_u8), False,
            )
            return final

    return serve, use_focal


def export_serving_fn(cfg, state, platforms=None) -> bytes:
    """Serialize the serving fn for (batch_size, input_height, input_width)."""
    if platforms and any(p != "tpu" for p in platforms):
        # pallas_call has no lowering for non-TPU targets; the jnp LPG path
        # is the same math (hardware-validated <=4.2e-7 apart).
        cfg = cfg.replace(use_pallas="never")
    serve, use_focal = build_serve_fn(cfg, state)
    img_spec = jax.ShapeDtypeStruct(
        (cfg.batch_size, cfg.input_height, cfg.input_width, 3), jnp.uint8
    )
    specs = (img_spec, jax.ShapeDtypeStruct((cfg.batch_size,), jnp.float32)) if use_focal else (img_spec,)
    kw = {"platforms": platforms} if platforms else {}
    exp = jax.export.export(jax.jit(serve), **kw)(*specs)
    return exp.serialize()


def main(argv=None):
    cfg = parse_args(argv, mode="test")
    from bts_tpu.config import adopt_sidecar_geometry

    cfg = adopt_sidecar_geometry(cfg)  # trained-run stride-2 geometry, if recorded
    if not cfg.export_path:
        print("[bts_tpu] --export_path is required", file=sys.stderr)
        return 2
    from bts_tpu.cli.bts_test import restore_state

    model = create_model(cfg)
    sample = jnp.zeros((cfg.batch_size, cfg.input_height, cfg.input_width, 3), jnp.float32)
    state = restore_state(cfg, model, sample)
    platforms = [p for p in cfg.export_platforms.split(",") if p] or None
    blob = export_serving_fn(cfg, state, platforms)
    with open(cfg.export_path, "wb") as f:
        f.write(blob)
    sig = "images_u8, focal" if cfg.dataset == "kitti" else "images_u8"
    print(
        f"[bts_tpu] exported serve({sig}) "
        f"b{cfg.batch_size} {cfg.input_height}x{cfg.input_width} "
        f"platforms={platforms or ['current']} -> {cfg.export_path} "
        f"({len(blob) / 1e6:.1f} MB)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
