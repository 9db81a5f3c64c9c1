"""Fused Pallas decoder tail (ops.tail_pallas) — interpret-mode CPU tests.

Tolerances: the fused kernel and the literal module path are two different
bf16 rounding schedules of the same function.  Measured on the v5e against
the f32 ground truth (scripts/validate_pallas_tpu.py records this), the
LITERAL bf16 path deviates by up to 0.107 (mean 1.3e-3, sigmoid units) on
random weights while the fused kernel deviates 0.086 (mean 1.1e-3) — the
kernel is no further from the truth than the path it replaces.  Tests
therefore assert on the mean plus a generous max bound for random weights,
and tightly for real (lecun-normal) init weights where logits saturate.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bts_tpu.ops.lpg_pallas as lpg_mod
from bts_tpu.models import BtsModel
from bts_tpu.models.layers import _up2x_conv
from bts_tpu.ops.lpg_pallas import lpg_fused
from bts_tpu.ops.tail_pallas import (
    fused_tail,
    interleave2x2,
    lpg_phase_planes,
    tail_supported,
)


@pytest.fixture(autouse=True)
def _interpret_mode():
    old = lpg_mod._INTERPRET
    lpg_mod._INTERPRET = True
    yield
    lpg_mod._INTERPRET = old


def _t(rng, *shape, scale=0.3):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


@pytest.mark.parametrize("k", [2, 4, 8])
def test_phase_lpg_matches_fused_lpg(k):
    rng = np.random.default_rng(0)
    b, hh, w2 = 2, 16, 128
    raw = _t(rng, b, 2 * hh // k, 2 * w2 // k, 3)
    full = lpg_fused(raw, k)
    ph = lpg_phase_planes(raw, k)
    assert ph.shape == (b, 4, hh, w2)
    np.testing.assert_allclose(
        np.asarray(interleave2x2(ph)), np.asarray(full), rtol=0, atol=1e-6
    )


def _tail_params(rng):
    return {
        "up": {"kernel": _t(rng, 3, 3, 64, 32), "bias": _t(rng, 32)},
        "r1": {"kernel": _t(rng, 1, 1, 32, 16), "bias": _t(rng, 16)},
        "r2": {"kernel": _t(rng, 1, 1, 16, 8), "bias": _t(rng, 8)},
        "r3": {"kernel": _t(rng, 1, 1, 8, 1), "bias": _t(rng, 1)},
        "i1": {"kernel": _t(rng, 3, 3, 36, 32), "bias": _t(rng, 32)},
        "f": {"kernel": _t(rng, 3, 3, 32, 1), "bias": _t(rng, 1)},
    }


def _literal_tail(p, x, d2, d4, d8):
    def conv(xx, k, b):
        y = jax.lax.conv_general_dilated(
            xx, k.astype(xx.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b.astype(xx.dtype)

    up1 = jax.nn.elu(_up2x_conv(x, p["up"]["kernel"]) + p["up"]["bias"].astype(x.dtype))
    r = jax.nn.elu(conv(up1, p["r1"]["kernel"], p["r1"]["bias"]))
    r = jax.nn.elu(conv(r, p["r2"]["kernel"], p["r2"]["bias"]))
    d1x1 = jax.nn.sigmoid(conv(r, p["r3"]["kernel"], p["r3"]["bias"]).astype(jnp.float32))
    cat = jnp.concatenate(
        [up1, d1x1.astype(x.dtype), d2[..., None].astype(x.dtype),
         d4[..., None].astype(x.dtype), d8[..., None].astype(x.dtype)], axis=-1)
    i1 = jax.nn.elu(conv(cat, p["i1"]["kernel"], p["i1"]["bias"]))
    logits = conv(i1, p["f"]["kernel"], p["f"]["bias"])
    return jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0], d1x1[..., 0]


def test_fused_tail_matches_literal_composition():
    rng = np.random.default_rng(0)
    b, hh, w2 = 2, 16, 128
    p = _tail_params(rng)
    iconv2 = _t(rng, b, hh, w2, 64).astype(jnp.bfloat16)
    raws = [_t(rng, b, 2 * hh // k, 2 * w2 // k, 3) for k in (2, 4, 8)]
    d2, d4, d8 = (lpg_fused(r, k) for r, k in zip(raws, (2, 4, 8)))
    want_final, want_d1x1 = jax.jit(_literal_tail)(p, iconv2, d2, d4, d8)

    phs = [lpg_phase_planes(r, k) for r, k in zip(raws, (2, 4, 8))]
    fin_ph, d1_ph = jax.jit(lambda *a: fused_tail(*a, params=p))(iconv2, *phs)
    got_final = np.asarray(interleave2x2(fin_ph))
    got_d1x1 = np.asarray(interleave2x2(d1_ph))

    ef = np.abs(got_final - np.asarray(want_final))
    ed = np.abs(got_d1x1 - np.asarray(want_d1x1))
    # random-weight bf16 rounding-schedule noise (see module docstring):
    # the mean is the meaningful bound; the max on random mid-slope logits
    # sits at the same ~0.1 level the LITERAL path shows vs f32 truth
    assert ef.mean() < 3e-3 and ef.max() < 0.15, (ef.mean(), ef.max())
    assert ed.mean() < 2e-3 and ed.max() < 0.08, (ed.mean(), ed.max())


def test_model_fused_tail_matches_literal_path():
    # Real init weights (saturated logits): the two paths agree tightly,
    # and the phase-evaluated aux LPG maps are exact.
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 32, 256, 3)).astype(np.float32))
    kw = dict(encoder_name="mobilenetv2_bts", max_depth=10.0,
              num_features=512, dtype=jnp.bfloat16)
    lit = BtsModel(fused_tail="never", **kw)
    fus = BtsModel(fused_tail="always", **kw)
    v = jax.jit(lambda k, xx: lit.init(k, xx, False))(jax.random.PRNGKey(0), x)
    # identical parameter trees: the fused path reads the literal modules'
    # params instead of owning any
    out_l = jax.jit(lambda xx: lit.apply(v, xx, False))(x)
    out_f = jax.jit(lambda xx: fus.apply(v, xx, False))(x)
    for name, a, b, tol in zip(
        ("d8", "d4", "d2", "d1x1", "final"),
        out_l, out_f, (1e-5, 1e-5, 1e-5, 5e-3, 5e-2),
    ):
        err = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        assert a.shape == b.shape
        assert err.max() < tol, (name, err.max())


def test_model_fused_tail_focal_scaling():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 32, 256, 3)).astype(np.float32))
    focal = jnp.asarray([600.0], jnp.float32)
    kw = dict(encoder_name="mobilenetv2_bts", max_depth=10.0,
              num_features=512, dtype=jnp.bfloat16)
    fus = BtsModel(fused_tail="always", **kw)
    v = jax.jit(lambda k, xx: fus.init(k, xx, False))(jax.random.PRNGKey(0), x)
    base = jax.jit(lambda xx: fus.apply(v, xx, False)[-1])(x)
    scaled = jax.jit(lambda xx: fus.apply(v, xx, False, focal)[-1])(x)
    np.testing.assert_allclose(
        np.asarray(scaled), np.asarray(base) * float(focal[0] / 715.0873),
        rtol=1e-6,
    )


def test_tail_supported_guards():
    assert tail_supported((1, 176, 608, 64))
    assert tail_supported((1, 176, 1024, 64))      # width-independent tiling
    assert not tail_supported((1, 176, 608, 32))   # bts_size != 512
    assert not tail_supported((1, 175, 608, 64))   # H/2 not a tile multiple


def test_fused_tail_ragged_width():
    # w2 not a multiple of the WB col tile: the kernel pads to the tile
    # grid and masks with absolute cols; outputs must match the literal
    # composition on the real width (exercises the ragged last tile).
    rng = np.random.default_rng(4)
    b, hh, w2 = 1, 16, 152  # w2p = 256, last tile 24 real + 104 pad cols
    p = _tail_params(rng)
    iconv2 = _t(rng, b, hh, w2, 64).astype(jnp.bfloat16)
    raws = [_t(rng, b, 2 * hh // k, 2 * w2 // k, 3) for k in (2, 4, 8)]
    d2, d4, d8 = (lpg_fused(r, k) for r, k in zip(raws, (2, 4, 8)))
    want_final, want_d1x1 = jax.jit(_literal_tail)(p, iconv2, d2, d4, d8)
    phs = [lpg_phase_planes(r, k) for r, k in zip(raws, (2, 4, 8))]
    fin_ph, d1_ph = jax.jit(lambda *a: fused_tail(*a, params=p))(iconv2, *phs)
    ef = np.abs(np.asarray(interleave2x2(fin_ph)) - np.asarray(want_final))
    ed = np.abs(np.asarray(interleave2x2(d1_ph)) - np.asarray(want_d1x1))
    assert ef.mean() < 3e-3 and ef.max() < 0.15, (ef.mean(), ef.max())
    assert ed.mean() < 2e-3 and ed.max() < 0.08, (ed.mean(), ed.max())


def test_auto_dispatch_keeps_literal_path():
    # The kernel is measured-and-rejected for production (PERFORMANCE.md):
    # "auto" must resolve to the literal XLA tail; "always" engages the
    # harness and raises loudly on unsupported shapes instead of silently
    # falling back.
    from bts_tpu.models.bts import _tail_ok

    assert not _tail_ok("auto", False, (1, 176, 608, 64))
    assert not _tail_ok("never", False, (1, 176, 608, 64))
    assert _tail_ok("always", False, (1, 176, 608, 64))
    assert not _tail_ok("always", True, (1, 176, 608, 64))  # train: no VJP
    with pytest.raises(ValueError):
        _tail_ok("always", False, (1, 176, 608, 32))


def test_fused_tail_never_in_training_graph():
    # train=True must keep the literal (differentiable) path even when the
    # flag says always — the kernel has no VJP.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 32, 256, 3)).astype(np.float32))
    fus = BtsModel(encoder_name="mobilenetv2_bts", max_depth=10.0,
                   num_features=512, dtype=jnp.float32, fused_tail="always")
    v = fus.init(jax.random.PRNGKey(0), x, True)

    def loss(params):
        out, _ = fus.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, True, mutable=["batch_stats"])
        return jnp.mean(out[-1])

    g = jax.grad(loss)(v["params"])
    norm = float(jnp.sqrt(sum(jnp.sum(l**2) for l in jax.tree.leaves(g))))
    assert np.isfinite(norm) and norm > 0
