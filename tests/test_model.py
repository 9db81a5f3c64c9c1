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


def test_fused_upconv_matches_literal():
    """UpConv(fused=True) — ONE lhs-dilated conv with the K (*) ones(2,2)
    kernel — must match the literal upsample->conv->ELU form with the SAME
    param tree (paths, shapes, AND init values), so checkpoints/converters
    are unaffected (PERFORMANCE.md round 3)."""
    import numpy as np

    from bts_tpu.models.layers import UpConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 6)).astype(np.float32))
    fused = UpConv(8, fused=True)
    plain = UpConv(8, fused=False)
    vf = fused.init(jax.random.PRNGKey(1), x)
    vp = plain.init(jax.random.PRNGKey(1), x)
    pf = jax.tree_util.tree_flatten_with_path(vf)[0]
    pp = jax.tree_util.tree_flatten_with_path(vp)[0]
    assert [p for p, _ in pf] == [p for p, _ in pp]
    assert all(np.array_equal(a, b) for (_, a), (_, b) in zip(pf, pp))
    # cross-apply: fused path consumes the literal path's params verbatim
    of = np.asarray(fused.apply(vp, x))
    op = np.asarray(plain.apply(vp, x))
    np.testing.assert_allclose(of, op, rtol=2e-5, atol=2e-6)


def test_upconv_dilated_bwd_grads_match_literal():
    """The AD-derived backward of the lhs-dilated conv (bwd="dilated") must
    produce the same gradients as the GSPMD-proven literal-composition
    custom_vjp (bwd="literal") — same mathematical function, different
    lowering (layers._DilatedUpConv)."""
    import numpy as np

    from bts_tpu.models.layers import UpConv

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 10, 14, 6)).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(2, 20, 28, 8)).astype(np.float32))
    lit = UpConv(8, bwd="literal")
    dil = UpConv(8, bwd="dilated")
    v = lit.init(jax.random.PRNGKey(2), x)

    def loss(mod):
        return lambda p, xx: jnp.vdot(mod.apply(p, xx), cot)

    gl_p, gl_x = jax.grad(loss(lit), argnums=(0, 1))(v, x)
    gd_p, gd_x = jax.grad(loss(dil), argnums=(0, 1))(v, x)
    np.testing.assert_allclose(np.asarray(gd_x), np.asarray(gl_x), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gl_p), jax.tree.leaves(gd_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)
