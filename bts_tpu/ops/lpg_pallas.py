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


def _fwd_call(n1, n2, n3, n4, *, k: int):
    """The raw forward pallas_call on (local) (b, h, w) components."""
    b, h, w = n1.shape
    in_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((1, h * k, w * k), lambda i: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, k=k),
        grid=(b,),
        in_specs=[in_spec] * 4,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h * k, w * k), jnp.float32),
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 4 * (h * k * h * w + h * k * w * w * k) + 7 * b * h * w * k * k,
            bytes_accessed=4 * (4 * b * h * w + b * h * w * k * k),
            transcendentals=0,
        ),
    )(n1, n2, n3, n4)


def _bwd_call(n1, n2, n3, n4, g, *, k: int):
    """The raw backward pallas_call on (local) shards; returns d(n1..n4)."""
    b, h, w = n1.shape
    in_spec = pl.BlockSpec((1, h, w), lambda i: (i, 0, 0))
    g_spec = pl.BlockSpec((1, h * k, w * k), lambda i: (i, 0, 0))
    out_shape = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, k=k),
        grid=(b,),
        in_specs=[in_spec] * 4 + [g_spec],
        out_specs=[in_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=_INTERPRET,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 8 * (h * k * h * w + h * k * w * w * k) + 10 * b * h * w * k * k,
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
                    f"--spatial_shards so input_height/(8*shards) is an integer"
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
