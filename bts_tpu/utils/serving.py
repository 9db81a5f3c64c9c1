"""Serving-side loader for exported BTS inference functions.

Counterpart of ``cli/bts_export.py`` (a TPU-native serving extension; the
reference lineage has no export story — SURVEY.md §2 inventory ends at the
test driver).  The artifact is a serialized ``jax.export.Exported``:
StableHLO plus calling convention, with the restored checkpoint weights
baked in as constants.  Loading requires only jax — not bts_tpu, not the
checkpoint, not the model code — and the call is jit-compatible:

    from bts_tpu.utils.serving import load_exported
    serve = load_exported("model.stablehlo")
    depth = serve(images_u8)            # (B, H, W, 3) u8 -> (B, H, W, 1) f32

Shape/dtype contracts are embedded in the artifact; mismatched calls fail
loudly with the expected signature.
"""

from __future__ import annotations

import jax


def load_exported(path: str):
    """Deserialize an exported serving fn; returns a jit-compatible callable."""
    with open(path, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))

    def serve(*args):
        return exp.call(*args)

    serve.exported = exp  # expose .in_avals / .platforms for introspection
    return serve
