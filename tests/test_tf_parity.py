"""Golden parity: TF/Keras BTS vs flax BtsModel, same weights, same outputs.

Builds the Keras BTS re-expression (scripts/tf_baseline.py) and the flax
BtsModel at an identical tiny DenseNet architecture, converts the random TF
weights through utils/tf_model_converter, and requires the final depth maps
to agree to ~1e-4 — pinning SAME padding, BN epsilon, concat order, LPG
math, and stream alignment all at once (SURVEY.md §4 "golden tests").
"""

import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "scripts")


@pytest.fixture(scope="module")
def pair():
    from tf_baseline import build_bts_tf

    from bts_tpu.models import BtsModel
    from bts_tpu.models.encoders import ENCODERS
    from bts_tpu.utils.tf_model_converter import convert_keras_model

    h, w, nf, max_depth = 64, 96, 32, 10.0
    growth, blocks, init_f = 8, (2, 2, 2, 2), 16

    tf.keras.utils.set_random_seed(0)
    tf.config.set_visible_devices([], "GPU")
    keras_model = build_bts_tf(h, w, max_depth=max_depth, nf=nf,
                               growth=growth, blocks=blocks, init_features=init_f)

    # same tiny DenseNet on the flax side (registered ad hoc)
    ENCODERS["tiny_densenet_bts"] = dict(
        cls=ENCODERS["densenet121_bts"]["cls"],
        kwargs=dict(growth_rate=growth, block_config=blocks, num_init_features=init_f),
        channels=(init_f, init_f, (init_f + growth * blocks[0]) // 2, 0, 0),
    )
    model = BtsModel(encoder_name="tiny_densenet_bts", max_depth=max_depth,
                     num_features=nf, dtype=jnp.float32, use_pallas="never")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), False)
    converted = convert_keras_model(keras_model, variables)
    return keras_model, model, converted, (h, w)


def test_stream_counts_align(pair):
    keras_model, model, converted, _ = pair
    # conversion itself validates counts + every leaf shape; reaching here
    # means the two graphs enumerate identical conv/BN streams
    assert converted["params"]


def test_forward_parity(pair):
    keras_model, model, converted, (h, w) = pair
    rng = np.random.default_rng(0)
    x = rng.random((2, h, w, 3)).astype(np.float32)

    tf_out = keras_model(tf.constant(x), training=False).numpy()[..., 0]
    *_, flax_final = model.apply(converted, jnp.asarray(x), False)
    flax_out = np.asarray(flax_final)[..., 0]

    assert tf_out.shape == flax_out.shape
    denom = np.abs(tf_out).max()
    rel = np.abs(tf_out - flax_out).max() / denom
    assert rel < 1e-4, f"TF/flax forward mismatch: max rel {rel:.2e}"


def test_forward_parity_is_sensitive(pair):
    """Sanity: perturbing one BN beta breaks parity (the test can fail)."""
    keras_model, model, converted, (h, w) = pair
    import copy

    from bts_tpu.utils.torch_converter import jax_to_py

    broken = copy.deepcopy(jax_to_py(converted))
    # perturb the decoder's first BN bias
    node = broken["params"]["BtsDecoder_0"]
    bn_key = sorted(k for k in node if k.startswith("BatchNorm"))[0]
    inner = node[bn_key]["BatchNorm_0"]
    inner["bias"] = inner["bias"] + 0.5

    rng = np.random.default_rng(0)
    x = rng.random((1, h, w, 3)).astype(np.float32)
    tf_out = keras_model(tf.constant(x), training=False).numpy()[..., 0]
    *_, flax_final = model.apply(broken, jnp.asarray(x), False)
    rel = np.abs(tf_out - np.asarray(flax_final)[..., 0]).max() / np.abs(tf_out).max()
    assert rel > 1e-4
