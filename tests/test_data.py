import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from bts_tpu.config import Config
from bts_tpu.data.augment import (
    augment_batch,
    eval_preprocess,
    normalize_image,
    random_crop,
    random_flip,
    rotate_image,
)
from bts_tpu.data.dataloader import BtsDataLoader, parse_filenames_file
from bts_tpu.data.depth_io import depth_to_png


def make_fake_dataset(root, n=6, h=96, w=128, dataset="kitti"):
    """Fabricate a reference-format split: PNG images + uint16 depth PNGs."""
    rng = np.random.default_rng(42)
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    os.makedirs(os.path.join(root, "gt"), exist_ok=True)
    lines = []
    for i in range(n):
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        depth = rng.uniform(0.5, 60.0, size=(h, w)).astype(np.float32)
        Image.fromarray(img).save(os.path.join(root, "img", f"{i}.png"))
        Image.fromarray(depth_to_png(depth, dataset)).save(os.path.join(root, "gt", f"{i}.png"))
        lines.append(f"img/{i}.png gt/{i}.png 721.5377\n")
    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        f.writelines(lines)
    return split


def test_parse_filenames(tmp_path):
    split = make_fake_dataset(str(tmp_path), n=3)
    samples = parse_filenames_file(split, str(tmp_path), str(tmp_path))
    assert len(samples) == 3
    assert samples[0].focal == 721.5377
    assert os.path.exists(samples[0].image_path)
    # None depth handling
    with open(split, "a") as f:
        f.write("img/0.png None\n")
    samples = parse_filenames_file(split, str(tmp_path), str(tmp_path))
    assert samples[-1].depth_path is None


def test_dataloader_train_batches(tmp_path):
    split = make_fake_dataset(str(tmp_path), n=6)
    cfg = Config(
        dataset="kitti",
        data_path=str(tmp_path),
        gt_path=str(tmp_path),
        filenames_file=split,
        batch_size=2,
        do_kb_crop=False,
    )
    loader = BtsDataLoader(cfg, "train")
    batches = list(loader.batches(num_epochs=1))
    assert len(batches) == 3
    b = batches[0]
    assert b["image"].shape == (2, 96, 128, 3) and b["image"].dtype == np.uint8
    assert b["depth"].shape == (2, 96, 128) and b["depth"].dtype == np.float32
    assert b["focal"].shape == (2,)
    # prefetched path yields the same count
    loader2 = BtsDataLoader(cfg, "train")
    assert len(list(loader2.prefetched(num_epochs=1))) == 3


def test_rotate_identity_and_ninety():
    img = jnp.arange(16.0).reshape(4, 4)
    out = rotate_image(img, 0.0, order=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    # 90-degree rotation of a symmetric-center grid permutes values, keeps set
    out90 = rotate_image(img, jnp.pi / 2, order=0)
    assert sorted(np.asarray(out90).ravel().tolist()) == sorted(np.asarray(img).ravel().tolist())


def test_rotate_shear_matches_gather_oracle(rng):
    """The gather-free 3-shear rotation (the train-time path; the
    map_coordinates gather lowers to a ~175x-slower scalar loop on TPU) must
    match the direct 2-D resample: exact identity at 0, sub-1e-2 interior
    agreement for bilinear at the reference's angle bounds, and nearest-mode
    depth outputs that are true source values or the 0 fill."""
    from scipy.ndimage import gaussian_filter

    from bts_tpu.data.augment import rotate_image, rotate_image_shear

    img = jnp.asarray(gaussian_filter(rng.uniform(0, 1, (40, 56, 3)), (2, 2, 0)))
    depth = jnp.asarray(gaussian_filter(rng.uniform(1, 10, (40, 56)), 2).astype(np.float32))

    out0 = rotate_image_shear(img, jnp.float32(0.0), order=1, max_degree=2.5)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(img))

    for deg in (1.0, -1.0, 2.5):
        a = jnp.float32(np.radians(deg))
        ref = np.asarray(rotate_image(img, a, order=1))
        got = np.asarray(rotate_image_shear(img, a, order=1, max_degree=2.5))
        # border sliver zero-fill differs; compare the interior
        assert np.abs(ref - got)[4:-4, 4:-4].max() < 1e-2

    a = jnp.float32(np.radians(2.0))
    dgot = np.asarray(rotate_image_shear(depth, a, order=0, max_degree=2.5))
    src = set(np.asarray(depth).ravel().tolist()) | {0.0}
    assert set(dgot.ravel().tolist()) <= src
    # per-pass rounding may pick a +-1px neighbor vs the direct 2-D nearest;
    # on a smooth field that bounds the VALUE error by the local gradient
    dref = np.asarray(rotate_image(depth, a, order=0))
    assert np.abs(dref - dgot)[4:-4, 4:-4].mean() < 0.05


def test_random_crop_and_flip_consistency(rng):
    img = jnp.array(rng.random((32, 48, 3)), jnp.float32)
    depth = img[..., 0] * 10
    key = jax.random.PRNGKey(3)
    ic, dc = random_crop(img, depth, key, 16, 24)
    assert ic.shape == (16, 24, 3) and dc.shape == (16, 24)
    # crop offsets identical for img and depth
    np.testing.assert_allclose(np.asarray(ic[..., 0] * 10), np.asarray(dc), rtol=1e-6)
    if_, df = random_flip(img, depth, key)
    np.testing.assert_allclose(np.asarray(if_[..., 0] * 10), np.asarray(df), rtol=1e-6)


def test_augment_batch_shapes_and_determinism(rng):
    images = rng.integers(0, 255, size=(2, 64, 96, 3), dtype=np.uint8)
    depths = rng.uniform(0.1, 10, size=(2, 64, 96)).astype(np.float32)
    key = jax.random.PRNGKey(7)
    kwargs = dict(out_h=48, out_w=64, dataset="nyu", degree=2.5, do_random_rotate=True)
    i1, d1 = augment_batch(jnp.array(images), jnp.array(depths), key, **kwargs)
    i2, d2 = augment_batch(jnp.array(images), jnp.array(depths), key, **kwargs)
    assert i1.shape == (2, 48, 64, 3) and d1.shape == (2, 48, 64)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))  # same key => identical
    i3, _ = augment_batch(jnp.array(images), jnp.array(depths), jax.random.PRNGKey(8), **kwargs)
    assert np.abs(np.asarray(i1) - np.asarray(i3)).max() > 1e-5  # different key => differs


def test_eval_preprocess_matches_normalize(rng):
    images = rng.integers(0, 255, size=(1, 8, 8, 3), dtype=np.uint8)
    out = eval_preprocess(jnp.array(images))
    ref = normalize_image(jnp.array(images, jnp.float32) / 255.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rotation_fills_zero_outside_frame():
    """Out-of-frame pixels after rotation must be 0 (masked by gt>thresh),
    not edge-replicated depths that would supervise the loss."""
    import jax.numpy as jnp

    from bts_tpu.data.augment import rotate_image

    depth = jnp.ones((32, 64), jnp.float32) * 5.0
    out = np.asarray(rotate_image(depth, jnp.asarray(0.3), order=0))  # ~17 deg
    # corners rotate out of frame -> filled with 0
    assert (out == 0).sum() > 0
    assert out.min() == 0.0
    # interior stays 5.0
    assert out[16, 32] == 5.0


def test_color_jitter_gated_at_half_probability(rng):
    """Reference applies photometric jitter with p=0.5 per sample."""
    import jax
    import jax.numpy as jnp

    from bts_tpu.data.augment import augment_batch

    n = 256
    imgs = jnp.ones((n, 16, 24, 3), jnp.float32) * 0.5
    depths = jnp.ones((n, 16, 24), jnp.float32)
    out, _ = augment_batch(
        imgs, depths, jax.random.PRNGKey(0), out_h=16, out_w=24,
        dataset="nyu", degree=0.0, do_random_rotate=False,
    )
    # un-normalize: images that exactly match the clean value were not jittered
    from bts_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

    restored = np.asarray(out) * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
    clean = np.abs(restored - 0.5).max(axis=(1, 2, 3)) < 1e-6
    frac = clean.mean()
    assert 0.35 < frac < 0.65, f"clean fraction {frac} not ~0.5"


def test_multihost_sample_sharding(tmp_path, rng):
    """Each host must load a disjoint contiguous slice of every global batch
    (identical seeded shuffle across hosts)."""
    from bts_tpu.config import Config
    from bts_tpu.data.dataloader import BtsDataLoader

    # 8 samples, global batch 4, simulate 2 hosts
    imgs = []
    for i in range(8):
        p = tmp_path / f"{i}.png"
        Image.fromarray(rng.integers(0, 255, (16, 24, 3), dtype=np.uint8)).save(p)
        imgs.append(f"{i}.png None {500.0 + i}")
    split = tmp_path / "s.txt"
    split.write_text("\n".join(imgs))
    cfg = Config(dataset="nyu", data_path=str(tmp_path), gt_path=str(tmp_path),
                 filenames_file=str(split), batch_size=4, use_native_loader="never")

    def collect(pi, pc):
        loader = BtsDataLoader(cfg, "train")
        loader.process_index, loader.process_count = pi, pc
        loader.local_batch = cfg.batch_size // pc
        out = []
        for b in loader.batches(num_epochs=1):
            out.append(b["focal"].copy())
        return out

    full = collect(0, 1)
    h0 = collect(0, 2)
    h1 = collect(1, 2)
    assert len(full) == 2 and len(h0) == 2 and len(h1) == 2
    for gb, a, b in zip(full, h0, h1):
        np.testing.assert_array_equal(np.concatenate([a, b]), gb)


def test_augmentation_prng_determinism(rng):
    """Same (seed, step) key -> bitwise identical augmented batch; a
    different key -> different batch (SURVEY.md §4 determinism tests)."""
    import jax
    import jax.numpy as jnp

    from bts_tpu.data.augment import augment_batch

    imgs = jnp.asarray(rng.integers(0, 255, (4, 24, 32, 3), dtype=np.uint8))
    depths = jnp.asarray(rng.uniform(0.2, 9.0, (4, 24, 32)).astype(np.float32))
    kw = dict(out_h=16, out_w=24, dataset="nyu", degree=2.5, do_random_rotate=True)
    a1, d1 = augment_batch(imgs, depths, jax.random.PRNGKey(7), **kw)
    a2, d2 = augment_batch(imgs, depths, jax.random.PRNGKey(7), **kw)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    a3, _ = augment_batch(imgs, depths, jax.random.PRNGKey(8), **kw)
    assert np.abs(np.asarray(a1) - np.asarray(a3)).max() > 0


def _make_kitti_stereo_dataset(root, n=6, h=96, w=128):
    """KITTI-style split with image_02 (left) and image_03 (right) trees.

    Left frames are all-10 pixels, right frames all-200, so a loaded batch
    reveals which camera each sample came from.
    """
    for cam, val in (("image_02", 10), ("image_03", 200)):
        os.makedirs(os.path.join(root, "drive", cam, "data"), exist_ok=True)
        os.makedirs(os.path.join(root, "drive", "proj_depth", "groundtruth", cam), exist_ok=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        for cam, val in (("image_02", 10), ("image_03", 200)):
            img = np.full((h, w, 3), val, np.uint8)
            depth = rng.uniform(1.5, 60.0, size=(h, w)).astype(np.float32)
            Image.fromarray(img).save(os.path.join(root, "drive", cam, "data", f"{i}.png"))
            Image.fromarray(depth_to_png(depth, "kitti")).save(
                os.path.join(root, "drive", "proj_depth", "groundtruth", cam, f"{i}.png"))
        lines.append(
            f"drive/image_02/data/{i}.png drive/proj_depth/groundtruth/image_02/{i}.png 721.5377\n")
    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        f.writelines(lines)
    return split


def test_use_right_random_per_sample(tmp_path):
    """Reference --use_right semantics (SURVEY.md §2.10): the right camera is
    chosen randomly per sample per epoch — both cameras appear within one
    epoch under a fixed seed, and each base sample appears exactly once."""
    split = _make_kitti_stereo_dataset(str(tmp_path))
    cfg = Config(dataset="kitti", data_path=str(tmp_path), gt_path=str(tmp_path),
                 filenames_file=split, batch_size=2, do_kb_crop=False,
                 use_right=True, use_native_loader="never", seed=3)
    loader = BtsDataLoader(cfg, "train")
    assert len(loader) == 6 and loader.steps_per_epoch() == 3
    order = loader._epoch_order()
    assert sorted(i % loader.n_base for i in order) == list(range(6))
    cams = set()
    for b in loader.batches(num_epochs=1):
        for img in b["image"]:
            cams.add(int(img[0, 0, 0]))
    assert cams == {10, 200}, f"expected both cameras in one epoch, saw {cams}"
    # non-train modes never swap cameras
    cfg_eval = cfg.replace(filenames_file_eval=split, data_path_eval=str(tmp_path),
                           gt_path_eval=str(tmp_path))
    ev = BtsDataLoader(cfg_eval, "online_eval")
    assert len(ev.samples) == ev.n_base == 6
    assert all(int(b["image"][0, 0, 0, 0]) == 10 for b in ev.batches())


def test_seed_controls_shuffle_and_camera_choice(tmp_path):
    split = _make_kitti_stereo_dataset(str(tmp_path))
    base = dict(dataset="kitti", data_path=str(tmp_path), gt_path=str(tmp_path),
                filenames_file=split, batch_size=2, use_right=True,
                use_native_loader="never")
    o1 = BtsDataLoader(Config(**base, seed=0), "train")._epoch_order()
    o2 = BtsDataLoader(Config(**base, seed=0), "train")._epoch_order()
    o3 = BtsDataLoader(Config(**base, seed=1), "train")._epoch_order()
    assert o1 == o2
    assert o1 != o3


def test_native_loader_raises_on_decode_failure(tmp_path):
    import pytest

    from bts_tpu.data import native_loader as nl
    if not nl.available():
        pytest.skip("native loader unavailable")
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "img"))
    os.makedirs(os.path.join(root, "gt"))
    rng = np.random.default_rng(0)
    lines = []
    for i in range(2):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        d = rng.uniform(0.5, 9.5, (480, 640)).astype(np.float32)
        Image.fromarray(img).save(os.path.join(root, "img", f"{i}.png"))
        Image.fromarray(depth_to_png(d, "nyu")).save(os.path.join(root, "gt", f"{i}.png"))
        lines.append(f"img/{i}.png gt/{i}.png 518.8579\n")
    with open(os.path.join(root, "img", "1.png"), "wb") as f:
        f.write(b"not a png at all")
    split = os.path.join(root, "split.txt")
    with open(split, "w") as f:
        f.writelines(lines)
    cfg = Config(dataset="nyu", data_path=root, gt_path=root, filenames_file=split,
                 batch_size=2, use_native_loader="always")
    loader = BtsDataLoader(cfg, "train")
    with pytest.raises(RuntimeError, match="decode failure"):
        list(loader.prefetched(num_epochs=1))


def test_py_prefetch_surfaces_decode_failure(tmp_path):
    """The Python prefetch worker must re-raise loader exceptions on the
    consumer side, not end the stream early (a swallowed error would let a
    run report success on a fraction of the data)."""
    import pytest

    root = str(tmp_path)
    split = make_fake_dataset(root, n=2, dataset="nyu")
    with open(os.path.join(root, "img", "1.png"), "wb") as f:
        f.write(b"not a png at all")
    cfg = Config(dataset="nyu", data_path=root, gt_path=root, filenames_file=split,
                 batch_size=2, do_kb_crop=False, use_native_loader="never")
    loader = BtsDataLoader(cfg, "train")
    with pytest.raises(Exception):
        list(loader.prefetched(num_epochs=1))


def test_train_split_smaller_than_batch_rejected(tmp_path):
    """Train mode drops the remainder, so a split smaller than one batch
    would silently yield zero batches per epoch — must fail fast."""
    import pytest

    split = make_fake_dataset(str(tmp_path), n=2)
    cfg = Config(dataset="kitti", data_path=str(tmp_path), gt_path=str(tmp_path),
                 filenames_file=split, batch_size=4, do_kb_crop=False)
    with pytest.raises(ValueError, match="batch_size"):
        BtsDataLoader(cfg, "train")
    # test mode pads instead — must construct fine
    assert BtsDataLoader(cfg, "test").batch_size == 4


def test_mid_epoch_resume_sample_exact(tmp_path):
    """Resuming at global step s yields exactly the batches an uninterrupted
    run would have produced from step s on (VERDICT r1: sample-exact resume),
    across an epoch boundary, on both the Python and native loader paths."""
    split = make_fake_dataset(str(tmp_path), n=6, h=32, w=48)
    base = dict(dataset="kitti", data_path=str(tmp_path), gt_path=str(tmp_path),
                filenames_file=split, batch_size=2, do_kb_crop=False, seed=5)

    for native in ("never", "auto"):
        loader = BtsDataLoader(Config(**base, use_native_loader=native), "train")
        spe = loader.steps_per_epoch()
        assert spe == 3
        full = list(loader.prefetched(num_epochs=2))  # 6 batches, 2 epochs
        # epoch orders must differ (per-epoch reshuffle) yet be recomputable
        assert loader._epoch_order(0) != loader._epoch_order(1)
        for s in (1, 2, 4):  # mid-epoch, epoch boundary-1, mid-epoch-2
            resumed = []
            it = loader.prefetched(num_epochs=None, start_step=s)
            for _ in range(len(full) - s):
                resumed.append(next(it))
            for got, want in zip(resumed, full[s:]):
                np.testing.assert_array_equal(got["image"], want["image"])
                np.testing.assert_array_equal(got["depth"], want["depth"])
                np.testing.assert_array_equal(got["focal"], want["focal"])


def test_arrayrecord_pipeline_matches_png_tree(tmp_path):
    """Record-path batches (VERDICT r1 #9 / SURVEY §2.10 [L]) must be
    byte-identical to the PNG-tree loader given the same seed: conversion
    packs the encoded bytes, the loader decodes+crops identically, and the
    (seed, epoch)-pure shuffle + sample-exact resume are shared."""
    import pytest

    pytest.importorskip("array_record")
    import subprocess
    import sys

    split = make_fake_dataset(str(tmp_path), n=6, h=64, w=96)
    base = dict(dataset="kitti", data_path=str(tmp_path), gt_path=str(tmp_path),
                batch_size=2, do_kb_crop=False, seed=7, use_native_loader="never")
    png_loader = BtsDataLoader(Config(**base, filenames_file=split), "train")
    want = list(png_loader.batches(num_epochs=1))

    out_prefix = os.path.join(str(tmp_path), "rec", "train")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "scripts", "make_records.py"),
         "--filenames_file", split, "--data_path", str(tmp_path),
         "--gt_path", str(tmp_path), "--out", out_prefix, "--shard_size", "4"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    pattern = out_prefix + "-*.array_record"
    import glob as _glob
    assert len(_glob.glob(pattern)) == 2  # 6 samples / shard_size 4

    rec_loader = BtsDataLoader(Config(**base, filenames_file=pattern), "train")
    assert rec_loader.n_base == 6 and rec_loader.steps_per_epoch() == 3
    got = list(rec_loader.batches(num_epochs=1))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["image"], w["image"])
        np.testing.assert_array_equal(g["depth"], w["depth"])
        np.testing.assert_array_equal(g["focal"], w["focal"])
    # sample-exact resume works on the record path too
    resumed = next(iter(rec_loader.batches(start_step=2)))
    np.testing.assert_array_equal(resumed["image"], want[2]["image"])


def test_rotate_matches_pil_oracle(rng):
    """Rotation pinned against an INDEPENDENT oracle: PIL's Image.rotate is
    the implementation the reference's dataloader actually calls (SURVEY
    §2.10 [H]: rotate image bilinear / depth nearest, zero fill).  PIL's
    screen-coordinate rotate(+deg) equals our math-convention
    rotate_image(-rad); the train-time angle is symmetric U(-degree,+degree)
    (augment.py::random_rotate) so the convention flip is
    distribution-neutral.  Interior-only comparison: PIL's zero-fill ring
    geometry differs by a border sliver, same caveat as the shear test."""
    img = rng.random((64, 96), dtype=np.float64).astype(np.float32)
    for deg in (0.9, 1.7, -2.3):
        a = jnp.float32(-np.radians(deg))
        pil_bl = np.asarray(
            Image.fromarray(img, mode="F").rotate(deg, resample=Image.BILINEAR)
        )
        ours_bl = np.asarray(rotate_image(jnp.asarray(img), a, order=1))
        assert np.abs(ours_bl - pil_bl)[4:-4, 4:-4].max() < 1e-4
        pil_nn = np.asarray(
            Image.fromarray(img, mode="F").rotate(deg, resample=Image.NEAREST)
        )
        ours_nn = np.asarray(rotate_image(jnp.asarray(img), a, order=0))
        # nearest: identical source picks except sub-pixel rounding ties
        mism = np.abs(ours_nn - pil_nn)[4:-4, 4:-4] > 1e-6
        assert mism.mean() < 0.005
    # negative control: the un-flipped sign must NOT match (a silently wrong
    # convention map would make this oracle vacuous)
    a = jnp.float32(np.radians(1.7))
    pil_bl = np.asarray(
        Image.fromarray(img, mode="F").rotate(1.7, resample=Image.BILINEAR)
    )
    wrong = np.asarray(rotate_image(jnp.asarray(img), a, order=1))
    assert np.abs(wrong - pil_bl)[4:-4, 4:-4].max() > 0.1
