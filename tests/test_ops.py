import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.ops.lpg import lpg_reference, local_planar_guidance, plane_from_spherical
from bts_tpu.ops.resize import downsample_nearest, upsample_nearest_2x
from bts_tpu.ops.silog import default_mask, silog_loss


def lpg_numpy_oracle(plane_eq, k):
    """Straight loop implementation of depth = n4/(n1 u + n2 v + n3)."""
    b, h, w, _ = plane_eq.shape
    out = np.zeros((b, h * k, w * k), np.float32)
    for bi in range(b):
        for y in range(h * k):
            for x in range(w * k):
                n1, n2, n3, n4 = plane_eq[bi, y // k, x // k]
                u = ((x % k) - (k - 1) / 2) / k
                v = ((y % k) - (k - 1) / 2) / k
                out[bi, y, x] = n4 / (n1 * u + n2 * v + n3)
    return out


def random_planes(rng, b, h, w):
    theta = rng.uniform(0, np.pi / 3, size=(b, h, w))
    phi = rng.uniform(0, 2 * np.pi, size=(b, h, w))
    dist = rng.uniform(0.5, 80.0, size=(b, h, w))
    return np.stack(
        [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta), dist],
        axis=-1,
    ).astype(np.float32)


def test_lpg_matches_numpy_oracle(rng):
    for k in (2, 4, 8):
        pe = random_planes(rng, 2, 3, 5)
        ref = lpg_numpy_oracle(pe, k)
        out = np.asarray(lpg_reference(jnp.array(pe), k))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)


def test_lpg_flat_plane_constant_depth(rng):
    # n = (0,0,1), n4 = d  =>  depth == d everywhere
    b, h, w, k = 1, 4, 4, 8
    pe = np.zeros((b, h, w, 4), np.float32)
    pe[..., 2] = 1.0
    pe[..., 3] = 7.5
    out = np.asarray(lpg_reference(jnp.array(pe), k))
    np.testing.assert_allclose(out, 7.5, rtol=1e-6)


def test_lpg_grad_finite(rng):
    pe = random_planes(rng, 1, 2, 2)

    def loss(p):
        return lpg_reference(p, 4).sum()

    g = jax.grad(loss)(jnp.array(pe))
    assert np.isfinite(np.asarray(g)).all()


def test_plane_from_spherical_unit_normal(rng):
    raw = rng.normal(size=(2, 3, 3, 3)).astype(np.float32)
    pe = np.asarray(plane_from_spherical(jnp.array(raw), max_depth=80.0))
    norms = np.linalg.norm(pe[..., :3], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    assert (pe[..., 3] >= 0).all() and (pe[..., 3] <= 80.0).all()
    assert (pe[..., 2] >= 0.5 - 1e-5).all()  # theta <= 60 deg => n3 >= cos(60)


def test_silog_closed_form():
    # constant ratio pred = c*gt: d = log c everywhere
    # loss = sqrt(mean(d^2) - vf*mean(d)^2)*10 = |log c|*sqrt(1-vf)*10
    gt = jnp.full((4, 8, 8), 5.0)
    pred = gt * 1.5
    mask = jnp.ones_like(gt, dtype=bool)
    out = float(silog_loss(pred, gt, mask, variance_focus=0.85))
    expected = abs(np.log(1.5)) * np.sqrt(1 - 0.85) * 10
    np.testing.assert_allclose(out, expected, rtol=1e-3)


def test_silog_respects_mask(rng):
    gt = jnp.array(rng.uniform(1.5, 60, size=(2, 16, 16)).astype(np.float32))
    pred = gt * 1.1
    mask = jnp.array(rng.random((2, 16, 16)) > 0.5)
    # corrupt unmasked entries of pred; loss must not change
    pred_bad = jnp.where(mask, pred, 1e6)
    l1 = float(silog_loss(pred, gt, mask))
    l2 = float(silog_loss(pred_bad, gt, mask))
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_default_mask_thresholds():
    gt = jnp.array([0.05, 0.5, 1.5])
    assert np.asarray(default_mask(gt, "nyu")).tolist() == [False, True, True]
    assert np.asarray(default_mask(gt, "kitti")).tolist() == [False, False, True]


def test_resize_helpers():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    up = upsample_nearest_2x(x)
    assert up.shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(up[:, ::2, ::2]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(up[:, 1::2, 1::2]), np.asarray(x))
    dn = downsample_nearest(up, 2)
    np.testing.assert_array_equal(np.asarray(dn), np.asarray(x))


def test_lpg_dispatcher_fallback(rng):
    pe = jnp.array(random_planes(rng, 1, 2, 2))
    out = local_planar_guidance(pe, 4, use_pallas="auto")
    ref = lpg_reference(pe, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_pallas_kernel_interpret_fwd_bwd(rng):
    """Pallas kernel logic vs jnp reference, interpret mode (CPU CI).

    Real-TPU lowering is validated by scripts/validate_pallas_tpu.py (the
    first kernel version passed interpret but was wrong on hardware —
    pltpu.repeat is a tile repeat; keep both checks).
    """
    from bts_tpu.ops import lpg_pallas

    lpg_pallas._INTERPRET = True
    try:
        for k, h, w in [(8, 3, 5), (4, 6, 10), (2, 12, 20)]:
            pe = jnp.array(random_planes(rng, 2, h, w))
            out = lpg_pallas.lpg(pe, k)
            ref = lpg_reference(pe, k)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)

            g = jnp.array(rng.standard_normal(out.shape).astype(np.float32))
            gp = jax.grad(lambda p: (lpg_pallas.lpg(p, k) * g).sum())(pe)
            gr = jax.grad(lambda p: (lpg_reference(p, k) * g).sum())(pe)
            np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-4)
    finally:
        lpg_pallas._INTERPRET = False


def test_lpg_strided_matches_downsampled_reference():
    """lpg_strided(p, k, s) must equal downsample_nearest(lpg(p, k), s)
    exactly — it is the same plane equation evaluated at every s-th pixel."""
    from bts_tpu.ops.lpg import lpg_reference, lpg_strided
    from bts_tpu.ops.resize import downsample_nearest

    rng = np.random.default_rng(5)
    plane = rng.normal(size=(2, 6, 10, 4)).astype(np.float32)
    plane[..., 2] += 3.0  # keep denominators away from zero
    plane[..., 3] = np.abs(plane[..., 3]) + 1.0
    for k, s in [(8, 4), (4, 2), (8, 2), (2, 1)]:
        full = lpg_reference(jnp.asarray(plane), k)
        expect = downsample_nearest(full[..., None], s)[..., 0]
        got = lpg_strided(jnp.asarray(plane), k, s)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))


def test_fused_head_matches_composed(monkeypatch):
    """lpg_fused (raw3 -> depth/max_depth, spherical transform inside the
    kernel) must match plane_from_spherical + lpg_reference + /max_depth,
    forward AND gradient (interpret mode)."""
    from bts_tpu.ops import lpg_pallas
    from bts_tpu.ops.lpg import lpg_reference, plane_from_spherical

    monkeypatch.setattr(lpg_pallas, "_INTERPRET", True)
    rng = np.random.default_rng(3)
    max_depth = 80.0
    raw = jnp.asarray(rng.normal(size=(2, 6, 10, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(2, 24, 40)).astype(np.float32))

    def composed(r):
        return lpg_reference(plane_from_spherical(r, max_depth), 4) / max_depth

    ref = composed(raw)
    ref_grad = jax.grad(lambda r: (composed(r) * g).sum())(raw)

    out = lpg_pallas.lpg_fused(raw, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
    grad = jax.grad(lambda r: (lpg_pallas.lpg_fused(r, 4) * g).sum())(raw)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref_grad), rtol=2e-4, atol=2e-5)


def test_lpg_scaled_from_raw_fallback_matches_pallas(monkeypatch):
    """The dispatcher's jnp fallback and the pallas path compute the same
    function of raw3 (model numerics must not depend on the backend)."""
    from bts_tpu.ops import lpg_pallas
    from bts_tpu.ops.lpg import lpg_scaled_from_raw

    monkeypatch.setattr(lpg_pallas, "_INTERPRET", True)
    rng = np.random.default_rng(4)
    raw = jnp.asarray(rng.normal(size=(1, 8, 6, 3)).astype(np.float32))
    a = lpg_scaled_from_raw(raw, 8, 10.0, use_pallas="never")
    b = lpg_scaled_from_raw(raw, 8, 10.0, use_pallas="always")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6)
