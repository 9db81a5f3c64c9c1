import numpy as np
import pytest

from bts_tpu.data.crops import (
    eigen_crop_mask,
    garg_crop_mask,
    kb_crop,
    kb_crop_box,
    nyu_border_crop,
)
from bts_tpu.data.depth_io import depth_from_png, depth_to_png, read_depth_png, write_depth_png


def test_kb_crop_geometry():
    # canonical KITTI raw size 375x1242
    top, left, h, w = kb_crop_box(375, 1242)
    assert (h, w) == (352, 1216)
    assert top == 375 - 352 == 23
    assert left == (1242 - 1216) // 2 == 13
    img = np.arange(375 * 1242 * 3).reshape(375, 1242, 3)
    out = kb_crop(img)
    assert out.shape == (352, 1216, 3)
    assert (out == img[23 : 23 + 352, 13 : 13 + 1216]).all()


def test_garg_crop_mask_bounds():
    m = garg_crop_mask(352, 1216)
    assert m.shape == (352, 1216)
    rows = np.where(m.any(axis=1))[0]
    cols = np.where(m.any(axis=0))[0]
    assert rows[0] == int(0.40810811 * 352) and rows[-1] == int(0.99189189 * 352) - 1
    assert cols[0] == int(0.03594771 * 1216) and cols[-1] == int(0.96405229 * 1216) - 1


def test_eigen_crop_mask_nyu():
    m = eigen_crop_mask(480, 640, "nyu")
    assert m[45:471, 41:601].all()
    assert m.sum() == (471 - 45) * (601 - 41)


def test_nyu_border_crop():
    img = np.zeros((480, 640, 3))
    assert nyu_border_crop(img).shape == (427, 565, 3)


@pytest.mark.parametrize("dataset,scale", [("kitti", 256.0), ("nyu", 1000.0)])
def test_depth_png_roundtrip(tmp_path, dataset, scale, rng):
    depth = rng.uniform(0.5, 60.0, size=(64, 96)).astype(np.float32)
    png = depth_to_png(depth, dataset)
    assert png.dtype == np.uint16
    back = depth_from_png(png, dataset)
    np.testing.assert_allclose(back, depth, atol=0.5 / scale + 1e-6)
    p = str(tmp_path / "d.png")
    write_depth_png(p, depth, dataset)
    back2 = read_depth_png(p, dataset)
    np.testing.assert_allclose(back2, back, atol=1e-7)
