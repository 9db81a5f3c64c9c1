"""Fused Pallas TPU kernels for Local Planar Guidance (fwd + custom VJP).

Replaces the upstream CUDA op (SURVEY.md §2.9) with a TPU-native kernel.
Why a kernel at all: the jnp fallback materializes a (B, h, k, w, k) f32
intermediate in HBM and then pays a lane-interleaving relayout for the
reshape to (B, h*k, w*k).  The Pallas kernel writes the final interleaved
layout directly from VMEM, reading each plane tensor exactly once.

Layout trick — element-repeat expansion as MXU matmuls: on TPU, vregs make
an in-register k-fold element repeat awkward (``pltpu.repeat`` is a TILE
repeat: [a,b] -> [a,b,a,b], not [a,a,b,b]).  Instead the (h, w) plane maps
are expanded to (h*k, w*k) with two matmuls against static 0/1 selector
matrices

    E = R @ x @ C,   R[i,j] = [j == i//k]  (h*k, h),
                     C[j,i] = [j == i//k]  (w, w*k)

which are exact copies (one 1.0 per row/col) and ride the MXU.  The
in-patch (u, v) offsets come from ``broadcasted_iota % k`` — no gathers.

Backward: d depth/d n_i are dense elementwise expressions; the k x k patch
reduction back to the (h, w) grid is the transposed selector matmuls.

Division is computed in f32 regardless of input dtype (bf16 plane params
lose ~2 digits in the denominator; parity target abs_rel <= 1e-3).

Spatial sharding (``--spatial_shards``): a bare ``pallas_call`` has no
partitioning rule, so GSPMD would replicate it (or fail) inside a
height-sharded program — defeating the point of sharding full-res
activations.  Both kernels are therefore wrapped in
``jax.experimental.custom_partitioning`` with a Shardy sharding rule
``b h w -> b (h k)(w k)``: batch and the plane grid's h/w rows shard
freely, each device runs the kernel on its local block, and the output
H = h*k rows inherit the h sharding (contiguous N-way split of H is
exactly an N-way split of the cell grid).  Sharded dims must divide
evenly — the partition callback checks and raises with the
``--spatial_shards`` constraint spelled out.

Correctness is pinned three ways: interpret-mode tests in tests/test_ops.py
(CPU CI), sharded-vs-unsharded parity on the 8-device CPU mesh
(tests/test_spatial_sharding.py), and the real-TPU check in
scripts/validate_pallas_tpu.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas imports fail gracefully on unsupported backends
    from jax.experimental import pallas as pl
    from jax.experimental.custom_partitioning import custom_partitioning

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False

# test hook: run kernels in interpret mode (CPU) — set by tests only
_INTERPRET = False


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
    """(v, u) patch-centered offset grids for the interleaved output tile."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_cols), 1)
    v = ((row_ids % k).astype(jnp.float32) - (k - 1) * 0.5) / k
    u = ((col_ids % k).astype(jnp.float32) - (k - 1) * 0.5) / k
    return v, u


def _row_expander(h: int, k: int):
    """(h*k, h) 0/1 matrix R with R[i, i//k] = 1 (element-repeat rows)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (h * k, h), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h * k, h), 1)
    return (cols == rows // k).astype(jnp.float32)


def _col_expander(w: int, k: int):
    """(w, w*k) 0/1 matrix C with C[i//k, i] = 1 (element-repeat cols)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (w, w * k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, w * k), 1)
    return (rows == cols // k).astype(jnp.float32)


def _mm(a, b):
    # HIGHEST: the TPU MXU's default precision rounds inputs to bf16; the
    # selector matmul must be an EXACT f32 copy (one 1.0 per row/col)
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _expand(x, r_mat, c_mat):
    """(h, w) -> (h*k, w*k) element-repeat via two exact-copy MXU matmuls."""
    return _mm(_mm(r_mat, x.astype(jnp.float32)), c_mat)


def _fwd_kernel(n1_ref, n2_ref, n3_ref, n4_ref, out_ref, *, k: int):
    h, w = n1_ref.shape[1], n1_ref.shape[2]
    r_mat = _row_expander(h, k)
    c_mat = _col_expander(w, k)
    n1 = _expand(n1_ref[0], r_mat, c_mat)
    n2 = _expand(n2_ref[0], r_mat, c_mat)
    n3 = _expand(n3_ref[0], r_mat, c_mat)
    n4 = _expand(n4_ref[0], r_mat, c_mat)
    v, u = _patch_offsets(k, h * k, w * k)
    out_ref[0] = n4 / (n1 * u + n2 * v + n3)


def _bwd_kernel(n1_ref, n2_ref, n3_ref, n4_ref, g_ref, d1_ref, d2_ref, d3_ref, d4_ref, *, k: int):
    h, w = n1_ref.shape[1], n1_ref.shape[2]
    r_mat = _row_expander(h, k)  # (h*k, h)
    c_mat = _col_expander(w, k)  # (w, w*k)
    n1 = _expand(n1_ref[0], r_mat, c_mat)
    n2 = _expand(n2_ref[0], r_mat, c_mat)
    n3 = _expand(n3_ref[0], r_mat, c_mat)
    n4 = _expand(n4_ref[0], r_mat, c_mat)
    g = g_ref[0].astype(jnp.float32)
    v, u = _patch_offsets(k, h * k, w * k)
    inv = 1.0 / (n1 * u + n2 * v + n3)
    ginv = g * inv
    common = -ginv * n4 * inv  # -g * n4 / denom^2

    def patch_sum(x):  # (h*k, w*k) -> (h, w): transposed expanders on the MXU
        t = jax.lax.dot_general(
            r_mat, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # R^T @ x : (h, w*k)
        return jax.lax.dot_general(
            t, c_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # @ C^T : (h, w)

    d1_ref[0] = patch_sum(common * u)
    d2_ref[0] = patch_sum(common * v)
    d3_ref[0] = patch_sum(common)
    d4_ref[0] = patch_sum(ginv)


def _plane_components(plane_eq):
    pe = plane_eq.astype(jnp.float32)
    return pe[..., 0], pe[..., 1], pe[..., 2], pe[..., 3]


# VMEM row-tiling: the kernels hold ~8 (fwd) / ~12 (bwd) live full-res f32
# tiles; one (h*k, w*k) block per program overflows the 16 MiB scoped VMEM
# at full KITTI resolution for the backward (measured: 17.13M at k=4,
# 352x1216).  The element-repeat expansion is block-diagonal in rows, so the
# grid tiles h into row chunks — each program expands its own cell rows
# independently (patch sums in the backward stay tile-local for the same
# reason).  ~200k floats per full-res tile keeps the worst kernel under
# ~10 MiB with headroom for spills.
_TILE_BUDGET_FLOATS = 200_000


def _h_tile(h: int, w: int, k: int) -> int:
    """Largest usable row-tile hb: divides h, fits the budget, and satisfies
    the Mosaic block constraint (second-to-last block dim divisible by 8,
    or equal to the full dim).  Falls back to the full h (one block) when no
    multiple-of-8 divisor fits — matching the pre-tiling behavior."""
    limit = max(1, _TILE_BUDGET_FLOATS // (w * k * k))
    for hb in range(min(h - 1, limit), 0, -1):
        if h % hb == 0 and hb % 8 == 0:
            return hb
    return h


def _fwd_call(n1, n2, n3, n4, *, k: int):
    """The raw forward pallas_call on (local) (b, h, w) components."""
    b, h, w = n1.shape
    hb = _h_tile(h, w, k)
    in_spec = pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0))
    out_spec = pl.BlockSpec((1, hb * k, w * k), lambda i, j: (i, j, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=(b, h // hb),
        in_specs=[in_spec] * 4,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * k, w * k), jnp.float32),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 4 * (h * k * hb * w + h * k * w * w * k) + 7 * b * h * w * k * k,
            bytes_accessed=4 * (4 * b * h * w + b * h * w * k * k),
            transcendentals=0,
        ),
    )(n1, n2, n3, n4)


def _bwd_call(n1, n2, n3, n4, g, *, k: int):
    """The raw backward pallas_call on (local) shards; returns d(n1..n4)."""
    b, h, w = n1.shape
    hb = _h_tile(h, w, k)
    in_spec = pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0))
    g_spec = pl.BlockSpec((1, hb * k, w * k), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=(b, h // hb),
        in_specs=[in_spec] * 4 + [g_spec],
        out_specs=[in_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 8 * (h * k * hb * w + h * k * w * w * k) + 10 * b * h * w * k * k,
            bytes_accessed=4 * b * h * w * (k * k + 8),
            transcendentals=0,
        ),
    )(n1, n2, n3, n4, g.astype(jnp.float32))


def _check_divisible(arg_shapes, k: int):
    """Fail fast when a sharded plane-grid dim does not divide evenly.

    GSPMD pads uneven shards for opaque custom calls; padded plane cells
    would silently produce garbage depth rows, so refuse instead.  The
    practical constraint: ``input_height/(8*spatial_shards)`` (the coarsest
    LPG head) must be an integer.
    """
    for s in jax.tree.leaves(arg_shapes):
        sharding = s.sharding
        spec = getattr(sharding, "spec", None)
        if spec is None:
            continue
        mesh_shape = sharding.mesh.shape
        for dim, (size, axes) in enumerate(zip(s.shape, spec)):
            if axes is None:
                continue
            axes = axes if isinstance(axes, tuple) else (axes,)
            n = 1
            for a in axes:
                n *= mesh_shape[a]
            if size % n:
                raise ValueError(
                    f"Pallas LPG (k={k}): dim {dim} of plane grid {s.shape} is "
                    f"sharded {n}-way but {size} % {n} != 0 — choose "
                    f"--spatial_shards/--spatial_shards_w so input_height/"
                    f"(8*shards) and input_width/(8*shards_w) are integers"
                )


def _make_partition(call, k: int):
    """custom_partitioning ``partition`` callback: run ``call`` per shard."""

    def lower_fn(*args):
        return call(*args, k=k)

    def partition(mesh, arg_shapes, result_shape):
        _check_divisible(arg_shapes, k)
        arg_shardings = jax.tree.map(lambda s: s.sharding, arg_shapes)
        result_shardings = jax.tree.map(lambda s: s.sharding, result_shape)
        return mesh, lower_fn, result_shardings, arg_shardings

    return partition


def _infer_fwd(k):
    """Legacy-GSPMD path (shardy reads sharding_rule instead)."""

    def infer(mesh, arg_shapes, result_shape):
        from jax.sharding import NamedSharding

        sh = NamedSharding(mesh, arg_shapes[0].sharding.spec)
        return jax.tree.map(lambda _: sh, result_shape)

    return infer


@functools.lru_cache(maxsize=None)
def _fwd_partitioned(k: int):
    """Shardy-partitionable forward: (n1..n4)(b,h,w) -> depth (b,h*k,w*k).

    The compound result factors ``(h ek)``/``(w ew)`` tie a contiguous
    N-way split of the full-res H to the same split of the cell grid h —
    exactly what ``--spatial_shards`` produces.
    """
    def fwd(n1, n2, n3, n4):  # positional-only surface for custom_partitioning
        return _fwd_call(n1, n2, n3, n4, k=k)

    fn = custom_partitioning(fwd)
    fn.def_partition(
        partition=_make_partition(_fwd_call, k),
        infer_sharding_from_operands=_infer_fwd(k),
        sharding_rule="b h w, b h w, b h w, b h w -> b (h ek) (w ew)",
        ek=k,
        ew=k,
    )
    return fn


@functools.lru_cache(maxsize=None)
def _bwd_partitioned(k: int):
    def bwd(n1, n2, n3, n4, g):
        return _bwd_call(n1, n2, n3, n4, g, k=k)

    fn = custom_partitioning(bwd)
    fn.def_partition(
        partition=_make_partition(_bwd_call, k),
        infer_sharding_from_operands=_infer_fwd(k),
        sharding_rule=(
            "b h w, b h w, b h w, b h w, b (h ek) (w ew) "
            "-> b h w, b h w, b h w, b h w"
        ),
        ek=k,
        ew=k,
    )
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lpg(plane_eq: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pallas LPG: plane_eq (B, h, w, 4) -> depth (B, h*k, w*k), f32."""
    return _lpg_fwd_impl(plane_eq, k)


def _lpg_fwd_impl(plane_eq, k):
    n1, n2, n3, n4 = _plane_components(plane_eq)
    return _fwd_partitioned(k)(n1, n2, n3, n4)


def _lpg_fwd(plane_eq, k):
    out = _lpg_fwd_impl(plane_eq, k)
    return out, plane_eq


def _lpg_bwd(k, plane_eq, g):
    n1, n2, n3, n4 = _plane_components(plane_eq)
    d1, d2, d3, d4 = _bwd_partitioned(k)(n1, n2, n3, n4, g.astype(jnp.float32))
    dplane = jnp.stack([d1, d2, d3, d4], axis=-1).astype(plane_eq.dtype)
    return (dplane,)


lpg.defvjp(_lpg_fwd, _lpg_bwd)


# ---------------------------------------------------------------------------
# Fused reduction_1x1 -> LPG head (BASELINE.json north-star names both the
# plane-coefficient head and the LPG as Pallas targets).  Consumes the RAW
# 3-channel reduction_1x1 output and applies the spherical transform
# (SURVEY.md §2.7: theta = sig*pi/3, phi = sig*2pi, dist = sig*max_depth)
# INSIDE the kernel, emitting depth/max_depth directly:
#
#     depth/max_depth = sigmoid(x2) / (n1*u + n2*v + n3)
#
# (the n4 = dist*max_depth and the later /max_depth cancel exactly, so the
# fused head also skips one full-resolution division pass).  Backward chains
# the existing patch-sum cotangents through the transform at LOW resolution.
# ---------------------------------------------------------------------------


def _spherical(x0, x1, x2):
    """Low-res spherical transform; returns (n1, n2, n3, n4_scaled)."""
    t = jax.nn.sigmoid(x0) * (jnp.pi / 3)
    p = jax.nn.sigmoid(x1) * (2 * jnp.pi)
    st, ct = jnp.sin(t), jnp.cos(t)
    sp, cp = jnp.sin(p), jnp.cos(p)
    return st * cp, st * sp, ct, jax.nn.sigmoid(x2)


def _fused_fwd_kernel(x0_ref, x1_ref, x2_ref, out_ref, *, k: int):
    h, w = x0_ref.shape[1], x0_ref.shape[2]
    n1, n2, n3, n4s = _spherical(
        x0_ref[0].astype(jnp.float32),
        x1_ref[0].astype(jnp.float32),
        x2_ref[0].astype(jnp.float32),
    )
    r_mat = _row_expander(h, k)
    c_mat = _col_expander(w, k)
    n1e = _expand(n1, r_mat, c_mat)
    n2e = _expand(n2, r_mat, c_mat)
    n3e = _expand(n3, r_mat, c_mat)
    n4e = _expand(n4s, r_mat, c_mat)
    v, u = _patch_offsets(k, h * k, w * k)
    out_ref[0] = n4e / (n1e * u + n2e * v + n3e)


def _fused_bwd_kernel(x0_ref, x1_ref, x2_ref, g_ref, d0_ref, d1_ref, d2_ref, *, k: int):
    h, w = x0_ref.shape[1], x0_ref.shape[2]
    x0 = x0_ref[0].astype(jnp.float32)
    x1 = x1_ref[0].astype(jnp.float32)
    x2 = x2_ref[0].astype(jnp.float32)
    s0 = jax.nn.sigmoid(x0)
    s1 = jax.nn.sigmoid(x1)
    s2 = jax.nn.sigmoid(x2)
    t = s0 * (jnp.pi / 3)
    p = s1 * (2 * jnp.pi)
    st, ct = jnp.sin(t), jnp.cos(t)
    sp, cp = jnp.sin(p), jnp.cos(p)
    n1, n2, n3, n4s = st * cp, st * sp, ct, s2

    r_mat = _row_expander(h, k)
    c_mat = _col_expander(w, k)
    n1e = _expand(n1, r_mat, c_mat)
    n2e = _expand(n2, r_mat, c_mat)
    n3e = _expand(n3, r_mat, c_mat)
    n4e = _expand(n4s, r_mat, c_mat)
    g = g_ref[0].astype(jnp.float32)
    v, u = _patch_offsets(k, h * k, w * k)
    inv = 1.0 / (n1e * u + n2e * v + n3e)
    ginv = g * inv
    common = -ginv * n4e * inv

    def patch_sum(x):
        t_ = jax.lax.dot_general(
            r_mat, x, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jax.lax.dot_general(
            t_, c_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    dn1 = patch_sum(common * u)  # (h, w) cotangents wrt n1..n4s
    dn2 = patch_sum(common * v)
    dn3 = patch_sum(common)
    dn4 = patch_sum(ginv)
    # chain through the spherical transform at LOW resolution
    dt = dn1 * (ct * cp) + dn2 * (ct * sp) - dn3 * st
    dp = dn1 * (-st * sp) + dn2 * (st * cp)
    d0_ref[0] = dt * (s0 * (1.0 - s0)) * (jnp.pi / 3)
    d1_ref[0] = dp * (s1 * (1.0 - s1)) * (2 * jnp.pi)
    d2_ref[0] = dn4 * (s2 * (1.0 - s2))


def _fused_fwd_call(x0, x1, x2, *, k: int):
    b, h, w = x0.shape
    hb = _h_tile(h, w, k)
    in_spec = pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0))
    out_spec = pl.BlockSpec((1, hb * k, w * k), lambda i, j: (i, j, 0))
    return pl.pallas_call(
        functools.partial(_fused_fwd_kernel, k=k),
        grid=(b, h // hb),
        in_specs=[in_spec] * 3,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * k, w * k), jnp.float32),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 4 * (h * k * hb * w + h * k * w * w * k) + 8 * b * h * w * k * k,
            bytes_accessed=4 * (3 * b * h * w + b * h * w * k * k),
            transcendentals=7 * b * h * w,
        ),
    )(x0, x1, x2)


def _fused_bwd_call(x0, x1, x2, g, *, k: int):
    b, h, w = x0.shape
    hb = _h_tile(h, w, k)
    in_spec = pl.BlockSpec((1, hb, w), lambda i, j: (i, j, 0))
    g_spec = pl.BlockSpec((1, hb * k, w * k), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    return pl.pallas_call(
        functools.partial(_fused_bwd_kernel, k=k),
        grid=(b, h // hb),
        in_specs=[in_spec] * 3 + [g_spec],
        out_specs=[in_spec] * 3,
        out_shape=[out_shape] * 3,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 8 * (h * k * hb * w + h * k * w * w * k) + 12 * b * h * w * k * k,
            bytes_accessed=4 * b * h * w * (k * k + 7),
            transcendentals=7 * b * h * w,
        ),
    )(x0, x1, x2, g.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _fused_fwd_partitioned(k: int):
    def fwd(x0, x1, x2):
        return _fused_fwd_call(x0, x1, x2, k=k)

    fn = custom_partitioning(fwd)
    fn.def_partition(
        partition=_make_partition(_fused_fwd_call, k),
        infer_sharding_from_operands=_infer_fwd(k),
        sharding_rule="b h w, b h w, b h w -> b (h ek) (w ew)",
        ek=k,
        ew=k,
    )
    return fn


@functools.lru_cache(maxsize=None)
def _fused_bwd_partitioned(k: int):
    def bwd(x0, x1, x2, g):
        return _fused_bwd_call(x0, x1, x2, g, k=k)

    fn = custom_partitioning(bwd)
    fn.def_partition(
        partition=_make_partition(_fused_bwd_call, k),
        infer_sharding_from_operands=_infer_fwd(k),
        sharding_rule=(
            "b h w, b h w, b h w, b (h ek) (w ew) -> b h w, b h w, b h w"
        ),
        ek=k,
        ew=k,
    )
    return fn


def _raw_components(raw3):
    r = raw3.astype(jnp.float32)
    return r[..., 0], r[..., 1], r[..., 2]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lpg_fused(raw3: jnp.ndarray, k: int) -> jnp.ndarray:
    """Fused head: raw reduction_1x1 output (B, h, w, 3) -> depth/max_depth
    (B, h*k, w*k) f32.  The spherical transform runs inside the kernel; the
    output is PRE-scaled (n4 = sig * max_depth and /max_depth cancel)."""
    return _lpg_fused_fwd_impl(raw3, k)


def _lpg_fused_fwd_impl(raw3, k):
    x0, x1, x2 = _raw_components(raw3)
    return _fused_fwd_partitioned(k)(x0, x1, x2)


def _lpg_fused_fwd(raw3, k):
    return _lpg_fused_fwd_impl(raw3, k), raw3


def _lpg_fused_bwd(k, raw3, g):
    x0, x1, x2 = _raw_components(raw3)
    d0, d1, d2 = _fused_bwd_partitioned(k)(x0, x1, x2, g.astype(jnp.float32))
    draw = jnp.stack([d0, d1, d2], axis=-1).astype(raw3.dtype)
    return (draw,)


lpg_fused.defvjp(_lpg_fused_fwd, _lpg_fused_bwd)
