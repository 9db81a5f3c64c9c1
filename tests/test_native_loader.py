"""Native C++ data plane vs PIL oracle: decode, crops, batch prefetch."""

import numpy as np
import pytest
from PIL import Image

from bts_tpu.data import native_loader as nl
from bts_tpu.data.crops import kb_crop, nyu_border_crop

pytestmark = pytest.mark.skipif(not nl.available(), reason="native lib unavailable")


@pytest.fixture
def png_rgb(tmp_path, rng):
    arr = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
    p = tmp_path / "img.png"
    Image.fromarray(arr).save(p)
    return str(p), arr


@pytest.fixture
def png_depth(tmp_path, rng):
    arr = rng.integers(0, 25000, (375, 1242), dtype=np.uint16)
    p = tmp_path / "d.png"
    Image.fromarray(arr).save(p)
    return str(p), arr


def test_decode_rgb_full(png_rgb):
    path, arr = png_rgb
    out = nl.decode_rgb(path, nl.CROP_NONE, arr.shape[0], arr.shape[1])
    np.testing.assert_array_equal(out, arr)


def test_decode_rgb_kb_crop(png_rgb):
    path, arr = png_rgb
    out = nl.decode_rgb(path, nl.CROP_KB, 352, 1216)
    np.testing.assert_array_equal(out, kb_crop(arr))


def test_decode_rgb_nyu_crop(tmp_path, rng):
    arr = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    p = tmp_path / "nyu.png"
    Image.fromarray(arr).save(p)
    out = nl.decode_rgb(str(p), nl.CROP_NYU, 427, 565)
    np.testing.assert_array_equal(out, nyu_border_crop(arr))


def test_decode_jpeg(tmp_path, rng):
    arr = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=95)
    out = nl.decode_rgb(str(p), nl.CROP_NONE, 64, 96)
    ref = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(out, ref)  # same libjpeg under the hood


def test_decode_depth_kitti_scale(png_depth):
    path, arr = png_depth
    out = nl.decode_depth(path, nl.CROP_NONE, 1.0 / 256.0, *arr.shape)
    np.testing.assert_allclose(out, arr.astype(np.float32) / 256.0, rtol=1e-6)


def test_decode_depth_kb_crop(png_depth):
    path, arr = png_depth
    out = nl.decode_depth(path, nl.CROP_KB, 1.0 / 256.0, 352, 1216)
    np.testing.assert_allclose(out, kb_crop(arr).astype(np.float32) / 256.0, rtol=1e-6)


def test_batch_loader_matches_single_decodes(tmp_path, rng):
    n, h, w = 6, 48, 64
    img_paths, dep_paths = [], []
    imgs, deps = [], []
    for i in range(n):
        a = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        d = rng.integers(0, 9000, (h, w), dtype=np.uint16)
        ip, dp = tmp_path / f"i{i}.png", tmp_path / f"d{i}.png"
        Image.fromarray(a).save(ip)
        Image.fromarray(d).save(dp)
        img_paths.append(str(ip))
        dep_paths.append(str(dp))
        imgs.append(a)
        deps.append(d.astype(np.float32) / 1000.0)

    loader = nl.NativeBatchLoader(
        img_paths, dep_paths, focals=np.arange(n, dtype=np.float32),
        batch=2, height=h, width=w, crop_mode=nl.CROP_NONE,
        inv_scale=1.0 / 1000.0, num_threads=2, prefetch=2,
    )
    order = np.array([3, 1, 4, 0, 5, 2], np.int32)
    loader.start_epoch(order)
    got = list(loader)
    assert len(got) == 3
    flat = np.concatenate([b["image"] for b in got])
    flatd = np.concatenate([b["depth"] for b in got])
    flatf = np.concatenate([b["focal"] for b in got])
    for j, idx in enumerate(order):
        np.testing.assert_array_equal(flat[j], imgs[idx])
        np.testing.assert_allclose(flatd[j], deps[idx], rtol=1e-6)
        assert flatf[j] == float(idx)
    assert loader.errors() == 0

    # second epoch reuses the same loader/threads cleanly
    loader.start_epoch(order[::-1].copy())
    got2 = list(loader)
    assert len(got2) == 3
    np.testing.assert_array_equal(got2[0]["image"][0], imgs[2])
    loader.close()


@pytest.mark.skipif(not nl.available(), reason="native library unavailable")
def test_mem_decode_matches_pil(rng):
    """In-memory decode (the ArrayRecord hot path, round 4): peek_dims +
    decode_rgb_mem/decode_depth_mem must be byte-exact vs PIL on PNG, and
    pixel-exact vs PIL's own decode on JPEG (same libjpeg underneath)."""
    import io

    img = rng.integers(0, 255, (120, 200, 3), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="PNG")
    data = b.getvalue()
    assert nl.peek_dims(data) == (120, 200)
    np.testing.assert_array_equal(nl.decode_rgb_mem(data), img)

    b = io.BytesIO()
    Image.fromarray(img).save(b, format="JPEG", quality=90)
    jd = b.getvalue()
    assert nl.peek_dims(jd) == (120, 200)
    np.testing.assert_array_equal(
        nl.decode_rgb_mem(jd), np.asarray(Image.open(io.BytesIO(jd)).convert("RGB"))
    )

    d = rng.integers(0, 60000, (64, 96)).astype(np.uint16)
    b = io.BytesIO()
    Image.fromarray(d).save(b, format="PNG")
    dd = b.getvalue()
    np.testing.assert_array_equal(nl.decode_depth_mem(dd), d.astype(np.float32))

    with pytest.raises(ValueError):
        nl.peek_dims(b"\x00" * 16)


@pytest.mark.skipif(not nl.available(), reason="native library unavailable")
def test_record_decode_native_matches_pil(rng):
    """decode_record(use_native=True) must equal the PIL path exactly, and
    fall back to PIL for payloads the native decoder can't parse (8-bit
    grayscale depth PNG)."""
    import io

    from bts_tpu.data.records import decode_record, encode_record

    img = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
    d = rng.integers(0, 60000, (80, 120)).astype(np.uint16)
    bi, bd = io.BytesIO(), io.BytesIO()
    Image.fromarray(img).save(bi, format="PNG")
    Image.fromarray(d).save(bd, format="PNG")
    rec = encode_record(bi.getvalue(), bd.getvalue(), 518.8)
    i1, d1, f1 = decode_record(rec, use_native=True)
    i2, d2, f2 = decode_record(rec, use_native=False)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(np.asarray(d1, np.float32), np.asarray(d2, np.float32))
    assert f1 == f2

    # 8-bit depth png: native path can't parse it -> PIL fallback, same values
    d8 = rng.integers(0, 255, (40, 60)).astype(np.uint8)
    b8 = io.BytesIO()
    Image.fromarray(d8).save(b8, format="PNG")
    rec8 = encode_record(bi.getvalue(), b8.getvalue(), 518.8)
    _, dn, _ = decode_record(rec8, use_native=True)
    np.testing.assert_array_equal(np.asarray(dn), d8)
