"""Fused Pallas TPU kernels for Local Planar Guidance (fwd + custom VJP).

Replaces the upstream CUDA op (SURVEY.md §2.9) with a TPU-native kernel.
Why a kernel at all: the jnp fallback materializes a (B, h, k, w, k) f32
intermediate in HBM and then pays a lane-interleaving relayout for the
reshape to (B, h*k, w*k).  The Pallas kernel writes the final interleaved
layout directly from VMEM, reading each plane tensor exactly once — the op
becomes purely HBM-bandwidth-bound at the size of its output.

Forward layout trick: for an output tile, per-pixel plane coefficients are
produced by `pltpu.repeat` along rows and lanes (VPU-local), and the
in-patch (u, v) offsets by `broadcasted_iota % k` — no gathers, no reshapes.

Backward: d depth / d(n1,n2,n3,n4) are dense elementwise expressions in
(depth, denom, u, v); the k x k patch reduction back to the (h, w) grid is
two matmuls with static 0/1 group-selector matrices — i.e. the reduction
rides the MXU instead of a strided-slice loop.

Division is computed in f32 regardless of input dtype (bf16 plane params
lose ~2 digits in the denominator; parity target abs_rel <= 1e-3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas imports fail gracefully on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def pallas_available() -> bool:
    """True when the default backend is a TPU and pallas imported."""
    if not _PALLAS_IMPORTED:
        return False
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover
        return False
    return dev.platform in ("tpu", "axon") or "TPU" in str(dev.device_kind)


def _patch_offsets(k: int, n_rows: int, n_cols: int):
    """(v, u) patch-centered offset grids for an output tile, via 2-D iota."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 1)
    v = ((row_ids % k).astype(jnp.float32) - (k - 1) * 0.5) / k
    u = ((col_ids % k).astype(jnp.float32) - (k - 1) * 0.5) / k
    return v, u


def _expand(x, k: int):
    """(hb, w) -> (hb*k, w*k) by element-repeat along both axes (VPU-local)."""
    return pltpu.repeat(pltpu.repeat(x, k, axis=0), k, axis=1)


def _fwd_kernel(n1_ref, n2_ref, n3_ref, n4_ref, out_ref, *, k: int):
    n1 = _expand(n1_ref[0].astype(jnp.float32), k)
    n2 = _expand(n2_ref[0].astype(jnp.float32), k)
    n3 = _expand(n3_ref[0].astype(jnp.float32), k)
    n4 = _expand(n4_ref[0].astype(jnp.float32), k)
    v, u = _patch_offsets(k, *n1.shape)
    out_ref[0] = n4 / (n1 * u + n2 * v + n3)


def _group_selector(h: int, k: int):
    """(h, h*k) 0/1 matrix S with S[i, i*k + j] = 1 — patch-sum via matmul."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, h * k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, h * k), 1)
    return (rows == cols // k).astype(jnp.float32)


def _bwd_kernel(n1_ref, n2_ref, n3_ref, n4_ref, g_ref, d1_ref, d2_ref, d3_ref, d4_ref, *, k: int):
    n1 = _expand(n1_ref[0].astype(jnp.float32), k)
    n2 = _expand(n2_ref[0].astype(jnp.float32), k)
    n3 = _expand(n3_ref[0].astype(jnp.float32), k)
    n4 = _expand(n4_ref[0].astype(jnp.float32), k)
    g = g_ref[0].astype(jnp.float32)
    v, u = _patch_offsets(k, *n1.shape)
    inv = 1.0 / (n1 * u + n2 * v + n3)
    ginv = g * inv
    common = -ginv * n4 * inv  # -g * n4 / denom^2
    hb = d1_ref.shape[1]
    w = d1_ref.shape[2]
    s_row = _group_selector(hb, k)  # (hb, hb*k)
    s_col = _group_selector(w, k)  # (w, w*k)

    def patch_sum(x):  # (hb*k, w*k) -> (hb, w) on the MXU
        t = jax.lax.dot_general(
            s_row, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return jax.lax.dot_general(
            t, s_col, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    d1_ref[0] = patch_sum(common * u)
    d2_ref[0] = patch_sum(common * v)
    d3_ref[0] = patch_sum(common)
    d4_ref[0] = patch_sum(ginv)


def _plane_components(plane_eq):
    pe = plane_eq.astype(jnp.float32)
    return pe[..., 0], pe[..., 1], pe[..., 2], pe[..., 3]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lpg(plane_eq: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pallas LPG: plane_eq (B, h, w, 4) -> depth (B, h*k, w*k), f32."""
    return _lpg_fwd_impl(plane_eq, k)


def _lpg_fwd_impl(plane_eq, k):
    b, h, w, _ = plane_eq.shape
    n1, n2, n3, n4 = _plane_components(plane_eq)
    grid = (b,)
    in_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, h * k, w * k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=grid,
        in_specs=[in_spec] * 4,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * k, w * k), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=7 * b * h * w * k * k, bytes_accessed=4 * (4 * b * h * w + b * h * w * k * k), transcendentals=0
        ),
    )(n1, n2, n3, n4)


def _lpg_fwd(plane_eq, k):
    out = _lpg_fwd_impl(plane_eq, k)
    return out, plane_eq


def _lpg_bwd(k, plane_eq, g):
    b, h, w, _ = plane_eq.shape
    n1, n2, n3, n4 = _plane_components(plane_eq)
    in_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, h * k, w * k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    d1, d2, d3, d4 = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=(b,),
        in_specs=[in_spec] * 4 + [g_spec],
        out_specs=[in_spec] * 4,
        out_shape=[out_shape] * 4,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h * w * k * k * 8 + h * (h * k) * (w * k) + h * w * (w * k)),
            bytes_accessed=4 * b * h * w * (k * k + 8),
            transcendentals=0,
        ),
    )(n1, n2, n3, n4, g.astype(jnp.float32))
    dplane = jnp.stack([d1, d2, d3, d4], axis=-1).astype(plane_eq.dtype)
    return (dplane,)


lpg.defvjp(_lpg_fwd, _lpg_bwd)
