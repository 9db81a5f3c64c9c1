import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bts_tpu.models import BtsModel
from bts_tpu.models.encoders import ENCODERS, build_encoder, encoder_channels

# Tiny input keeps CPU compile times tolerable; H, W must be /32.
H, W = 64, 96


@pytest.mark.parametrize("name", sorted(ENCODERS))
def test_encoder_feature_pyramid(name):
    enc = build_encoder(name)
    x = jnp.zeros((1, H, W, 3))
    variables = enc.init(jax.random.PRNGKey(0), x, False)
    feats = enc.apply(variables, x, False)
    assert len(feats) == 5
    expected_ch = encoder_channels(name)
    for i, (f, ch) in enumerate(zip(feats, expected_ch)):
        stride = 2 ** (i + 1)
        assert f.shape == (1, H // stride, W // stride, ch), (
            f"{name} tap {i}: {f.shape} != (1,{H // stride},{W // stride},{ch})"
        )


def test_bts_model_forward_shapes():
    model = BtsModel(encoder_name="mobilenetv2_bts", max_depth=10.0, num_features=256)
    x = jnp.zeros((2, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    d8, d4, d2, d1, final = model.apply(variables, x, False)
    for d in (d8, d4, d2, d1, final):
        assert d.shape == (2, H, W, 1)
    f = np.asarray(final)
    assert (f >= 0).all() and (f <= 10.0).all()
    for d in (d8, d4, d2, d1):
        assert np.isfinite(np.asarray(d)).all()


def test_bts_model_train_mode_has_batch_stats():
    model = BtsModel(encoder_name="mobilenetv2_bts", max_depth=10.0, num_features=128)
    x = jnp.zeros((1, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, True)
    assert "batch_stats" in variables
    outs, mutated = model.apply(
        variables, x, True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated


def test_focal_scaling():
    model = BtsModel(encoder_name="mobilenetv2_bts", max_depth=80.0, num_features=128)
    x = jnp.ones((1, H, W, 3)) * 0.5
    variables = model.init(jax.random.PRNGKey(0), x, False)
    *_, final_a = model.apply(variables, x, False, focal=jnp.array([715.0873]))
    *_, final_b = model.apply(variables, x, False, focal=jnp.array([2 * 715.0873]))
    np.testing.assert_allclose(np.asarray(final_b), 2 * np.asarray(final_a), rtol=1e-5)


def test_bf16_compute_dtype_runs():
    model = BtsModel(
        encoder_name="mobilenetv2_bts", max_depth=10.0, num_features=128, dtype=jnp.bfloat16
    )
    x = jnp.zeros((1, H, W, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    *_, final = model.apply(variables, x, False)
    assert final.dtype == jnp.float32  # final head forced back to f32
    assert np.isfinite(np.asarray(final)).all()
