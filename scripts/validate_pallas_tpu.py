"""Real-TPU validation of the Pallas LPG kernel vs the jnp reference.

Run on a TPU host (the CI conftest forces CPU, where the kernel runs only in
interpret mode): ``python scripts/validate_pallas_tpu.py``.
Exits nonzero on mismatch.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bts_tpu.ops.lpg import lpg_reference, plane_from_spherical
from bts_tpu.ops import lpg_pallas


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
    print("PALLAS-OK" if ok else "PALLAS-MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
