"""Real-TPU validation of the Pallas LPG kernel vs the jnp reference.

Run on a TPU host (the CI conftest forces CPU, where the kernel runs only in
interpret mode): ``python scripts/validate_pallas_tpu.py``.
Exits nonzero on mismatch.

``--tail`` additionally validates the (measured-and-rejected, harness-only;
see PERFORMANCE.md) fused decoder tail kernel against the literal XLA tail
at a small shape — its Mosaic compile takes ~2 min cold, so it is opt-in.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bts_tpu.ops.lpg import lpg_reference, plane_from_spherical
from bts_tpu.ops import lpg_pallas


def check_tail() -> bool:
    """Fused Pallas tail (ops.tail_pallas) vs the literal XLA composition."""
    from bts_tpu.models.layers import _up2x_conv
    from bts_tpu.ops.lpg_pallas import lpg_fused
    from bts_tpu.ops.tail_pallas import fused_tail, interleave2x2, lpg_phase_planes

    rng = np.random.default_rng(0)
    b, hh, w2 = 1, 16, 152  # exercises the ragged last column tile

    def t(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)

    params = {
        "up": {"kernel": t(3, 3, 64, 32), "bias": t(32)},
        "r1": {"kernel": t(1, 1, 32, 16), "bias": t(16)},
        "r2": {"kernel": t(1, 1, 16, 8), "bias": t(8)},
        "r3": {"kernel": t(1, 1, 8, 1), "bias": t(1)},
        "i1": {"kernel": t(3, 3, 36, 32), "bias": t(32)},
        "f": {"kernel": t(3, 3, 32, 1), "bias": t(1)},
    }
    x = t(b, hh, w2, 64)
    raws = [t(b, 2 * hh // k, 2 * w2 // k, 3) for k in (2, 4, 8)]

    def conv(xx, k_, b_):
        y = jax.lax.conv_general_dilated(
            xx, k_.astype(xx.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b_.astype(xx.dtype)

    def lit(xx):
        d2, d4, d8 = (lpg_fused(r, k) for r, k in zip(raws, (2, 4, 8)))
        p = params
        up1 = jax.nn.elu(_up2x_conv(xx, p["up"]["kernel"].astype(xx.dtype))
                         + p["up"]["bias"].astype(xx.dtype))
        r = jax.nn.elu(conv(up1, p["r1"]["kernel"], p["r1"]["bias"]))
        r = jax.nn.elu(conv(r, p["r2"]["kernel"], p["r2"]["bias"]))
        d1x1 = jax.nn.sigmoid(conv(r, p["r3"]["kernel"], p["r3"]["bias"]).astype(jnp.float32))
        cat = jnp.concatenate(
            [up1, d1x1.astype(xx.dtype), d2[..., None].astype(xx.dtype),
             d4[..., None].astype(xx.dtype), d8[..., None].astype(xx.dtype)], axis=-1)
        i1 = jax.nn.elu(conv(cat, p["i1"]["kernel"], p["i1"]["bias"]))
        return jax.nn.sigmoid(conv(i1, p["f"]["kernel"], p["f"]["bias"])
                              .astype(jnp.float32))[..., 0]

    def fus(xx):
        phs = [lpg_phase_planes(r, k) for r, k in zip(raws, (2, 4, 8))]
        fin_ph, _ = fused_tail(xx.astype(jnp.bfloat16), *phs, params)
        return interleave2x2(fin_ph)

    truth = np.asarray(jax.jit(lit)(x))                      # f32 literal
    lit_bf = np.asarray(jax.jit(lit)(x.astype(jnp.bfloat16)))
    got = np.asarray(jax.jit(fus)(x))
    e_fus = np.abs(got - truth)
    e_lit = np.abs(lit_bf - truth)
    print(f"tail: fused-vs-f32 max {e_fus.max():.4f} mean {e_fus.mean():.2e}  "
          f"(literal-bf16-vs-f32 max {e_lit.max():.4f} mean {e_lit.mean():.2e})")
    # contract: the kernel is no further from the f32 truth than the
    # literal bf16 rounding schedule it replaces (plus slack for ties)
    return bool(e_fus.mean() <= e_lit.mean() * 1.5 + 1e-4)


def main():
    assert lpg_pallas.pallas_available(), "not on a TPU backend"
    rng = np.random.default_rng(0)
    ok = True
    for k, h, w in [(8, 44, 152), (4, 88, 304), (2, 176, 608)]:
        raw = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        pe = plane_from_spherical(jnp.asarray(raw), 80.0)
        out_p = jax.jit(lambda p: lpg_pallas.lpg(p, k))(pe)
        out_r = jax.jit(lambda p: lpg_reference(p, k))(pe)
        ferr = float(jnp.abs(out_p - out_r).max() / jnp.abs(out_r).max())
        g = jnp.asarray(rng.standard_normal(out_p.shape).astype(np.float32))
        gp = jax.jit(jax.grad(lambda p: (lpg_pallas.lpg(p, k) * g).sum()))(pe)
        gr = jax.jit(jax.grad(lambda p: (lpg_reference(p, k) * g).sum()))(pe)
        berr = float(jnp.abs(gp - gr).max() / (jnp.abs(gr).max() + 1e-9))
        print(f"k={k}: fwd rel {ferr:.2e}  bwd rel {berr:.2e}")
        ok &= ferr < 1e-5 and berr < 1e-4

        # fused head (raw3 -> depth/max_depth, transform inside the kernel)
        r3 = jnp.asarray(raw)
        out_f = jax.jit(lambda r: lpg_pallas.lpg_fused(r, k))(r3)
        ref_f = out_r / 80.0
        fferr = float(jnp.abs(out_f - ref_f).max() / jnp.abs(ref_f).max())
        gf = jax.jit(jax.grad(lambda r: (lpg_pallas.lpg_fused(r, k) * g).sum()))(r3)
        gc = jax.jit(
            jax.grad(
                lambda r: ((lpg_reference(plane_from_spherical(r, 80.0), k) / 80.0) * g).sum()
            )
        )(r3)
        fberr = float(jnp.abs(gf - gc).max() / (jnp.abs(gc).max() + 1e-9))
        print(f"k={k} fused: fwd rel {fferr:.2e}  bwd rel {fberr:.2e}")
        ok &= fferr < 1e-5 and fberr < 1e-4
    if "--tail" in sys.argv:
        ok &= check_tail()
    print("PALLAS-OK" if ok else "PALLAS-MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
