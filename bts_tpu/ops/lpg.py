"""Local Planar Guidance (LPG) — the BTS hot op, TPU-native.

Math contract (SURVEY.md §2.8, BTS paper eq. 5): for scale k in {2,4,8},
given per-cell plane coefficients (n1,n2,n3,n4) on the (H/k, W/k) grid, the
full-resolution depth at the pixel with in-patch coordinates (u, v) is

    depth(u, v) = n4 / (n1*u + n2*v + n3)

where u, v are patch-centered: u = (i - (k-1)/2) / k for in-patch index
i in [0, k).  (n1,n2,n3) is a unit normal, n4 the plane-to-origin distance.

The upstream cleinc/bts ships this as a compiled CUDA TF op
(``custom_layer/local_planar_guidance.cu``); the bts-fully-tf fork re-expresses
it as tile/reshape TF ops (its "fully TF" headline, SURVEY.md §2.9).  Here:

- :func:`lpg_reference` — straight-line jnp broadcast version (XLA fuses it
  into neighboring elementwise work; also the unit-test oracle).
- :mod:`bts_tpu.ops.lpg_pallas` — Pallas TPU kernel (fwd + custom VJP) that
  writes the interleaved full-res layout directly from VMEM.  It consumes
  the already-transformed (n1..n4) plane tensor; the spherical transform
  itself (:func:`plane_from_spherical`) stays in XLA, which fuses it into
  the producing 1x1 conv.
- :func:`local_planar_guidance` — dispatcher (config ``use_pallas``).

The division is always computed in f32: with bf16 plane params the
denominator n1*u + n2*v + n3 loses ~2 decimal digits, which is visible in the
final depth map (parity target abs_rel <= 1e-3, SURVEY.md §6).
"""

from __future__ import annotations

import jax.numpy as jnp


def _patch_coords(k: int, dtype=jnp.float32):
    """Patch-centered offsets (i - (k-1)/2)/k for i in [0, k)."""
    i = jnp.arange(k, dtype=dtype)
    return (i - (k - 1) * 0.5) / k


def lpg_reference(plane_eq: jnp.ndarray, k: int) -> jnp.ndarray:
    """Naive jnp LPG. plane_eq: (B, h, w, 4) NHWC -> depth (B, h*k, w*k).

    Unit-test oracle and fallback path for ``use_pallas='never'``.
    """
    b, h, w, c = plane_eq.shape
    assert c == 4, f"plane_eq last dim must be 4, got {c}"
    pe = plane_eq.astype(jnp.float32)
    n1 = pe[..., 0][:, :, None, :, None]  # (B, h, 1, w, 1)
    n2 = pe[..., 1][:, :, None, :, None]
    n3 = pe[..., 2][:, :, None, :, None]
    n4 = pe[..., 3][:, :, None, :, None]
    u = _patch_coords(k)[None, None, None, None, :]  # column offset
    v = _patch_coords(k)[None, None, :, None, None]  # row offset
    depth = n4 / (n1 * u + n2 * v + n3)
    return depth.reshape(b, h * k, w * k)


def lpg_strided(plane_eq: jnp.ndarray, k: int, stride: int) -> jnp.ndarray:
    """LPG evaluated at every ``stride``-th full-res pixel (exact).

    Identical to ``downsample_nearest(lpg(plane_eq, k), stride)`` but never
    materializes the full-res map: the decoder's next-finer stage consumes
    the 8x8/4x4 depth maps at 1/4 and 1/2 resolution, and a strided slice of
    a (H, W) map is a gather + relayout on TPU (~1.4 ms/step at 352x1216,
    measured) while evaluating the plane equation at the strided in-patch
    offsets is a fused elementwise op at the LOW resolution.

    Derivation: ds[m, n] = full[m*s, n*s]; with e = k//s, full-res row m*s
    falls in cell m//e with in-patch index (m % e)*s, so the output is an
    e-fold expansion with offsets ((i*s) - (k-1)/2)/k for i in [0, e).
    """
    assert k % stride == 0, (k, stride)
    e = k // stride
    b, h, w, c = plane_eq.shape
    assert c == 4, f"plane_eq last dim must be 4, got {c}"
    pe = plane_eq.astype(jnp.float32)
    n1 = pe[..., 0][:, :, None, :, None]
    n2 = pe[..., 1][:, :, None, :, None]
    n3 = pe[..., 2][:, :, None, :, None]
    n4 = pe[..., 3][:, :, None, :, None]
    i = jnp.arange(e, dtype=jnp.float32) * stride
    off = (i - (k - 1) * 0.5) / k
    u = off[None, None, None, None, :]
    v = off[None, None, :, None, None]
    depth = n4 / (n1 * u + n2 * v + n3)
    return depth.reshape(b, h * e, w * e)


def plane_from_spherical(raw3: jnp.ndarray, max_depth: float) -> jnp.ndarray:
    """reduction_1x1 head transform (SURVEY.md §2.7): 3 raw channels ->
    (n1,n2,n3,n4) unit-normal plane via spherical parameterization:

        theta = sigmoid(x0) * pi / 3        (polar angle, <= 60 deg)
        phi   = sigmoid(x1) * pi * 2        (azimuth)
        dist  = sigmoid(x2) * max_depth     (plane distance n4)
        n1, n2, n3 = sin t cos p, sin t sin p, cos t
    """
    import jax.nn

    x = raw3.astype(jnp.float32)
    theta = jax.nn.sigmoid(x[..., 0]) * (jnp.pi / 3)
    phi = jax.nn.sigmoid(x[..., 1]) * (jnp.pi * 2)
    dist = jax.nn.sigmoid(x[..., 2]) * max_depth
    n1 = jnp.sin(theta) * jnp.cos(phi)
    n2 = jnp.sin(theta) * jnp.sin(phi)
    n3 = jnp.cos(theta)
    return jnp.stack([n1, n2, n3, dist], axis=-1)


def local_planar_guidance(plane_eq: jnp.ndarray, k: int, use_pallas: str = "auto") -> jnp.ndarray:
    """Dispatch LPG to the Pallas kernel or the jnp fallback.

    ``use_pallas``: 'always' | 'never' | 'auto' (auto = pallas on TPU
    backends, jnp elsewhere).
    """
    if use_pallas == "never":
        return lpg_reference(plane_eq, k)
    try:
        from bts_tpu.ops import lpg_pallas

        if use_pallas == "always" or lpg_pallas.pallas_available():
            return lpg_pallas.lpg(plane_eq, k)
    except Exception:
        if use_pallas == "always":
            raise
    return lpg_reference(plane_eq, k)


def lpg_scaled_from_raw(
    raw3: jnp.ndarray, k: int, max_depth: float, use_pallas: str = "auto"
) -> jnp.ndarray:
    """Fused head: raw reduction_1x1 output -> depth/max_depth at full res.

    Pallas path (:func:`bts_tpu.ops.lpg_pallas.lpg_fused`) folds the
    spherical transform AND the /max_depth scaling into the kernel (n4 =
    sigmoid*max_depth and the division cancel exactly — one fewer
    full-resolution elementwise pass).  Fallback composes the public
    pieces; both paths return the SAME function of raw3.
    """
    if use_pallas != "never":
        try:
            from bts_tpu.ops import lpg_pallas

            if use_pallas == "always" or lpg_pallas.pallas_available():
                return lpg_pallas.lpg_fused(raw3, k)
        except Exception:
            if use_pallas == "always":
                raise
    plane = plane_from_spherical(raw3, max_depth)
    return lpg_reference(plane, k) / max_depth
