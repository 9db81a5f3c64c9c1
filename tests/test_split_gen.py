"""scripts/make_split.py output must be byte-compatible with the reference
split-file format (SURVEY.md §2.15; VERDICT r1 #10).

The canonical eigen/nyu lists are dataset-derived and absent offline; the
generator is the offline substitute, so its output is validated here against
train_test_inputs/example_split.txt line-for-line: a fabricated KITTI tree
containing exactly the example's frames must regenerate the example bytes.
"""

import os
import subprocess
import sys

import numpy as np
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAKE_SPLIT = os.path.join(REPO, "scripts", "make_split.py")
EXAMPLE = os.path.join(REPO, "train_test_inputs", "example_split.txt")


def _png(path, shape=(8, 8, 3), dtype=np.uint8):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.zeros(shape, dtype)
    Image.fromarray(arr).save(path)


def _run(args):
    r = subprocess.run([sys.executable, MAKE_SPLIT] + args, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return r


def test_kitti_generator_reproduces_example_split(tmp_path):
    data = tmp_path / "kitti"
    gt = tmp_path / "kitti_gt"
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    # frame 69 has gt, frame 70 does not — exactly the example file's cases
    _png(str(data / drive / "image_02/data/0000000069.png"))
    _png(str(data / drive / "image_02/data/0000000070.png"))
    _png(
        str(gt / "2011_09_26_drive_0002_sync/proj_depth/groundtruth/image_02/0000000069.png"),
        shape=(8, 8),
        dtype=np.uint16,
    )
    out = str(tmp_path / "split.txt")
    _run(["--dataset", "kitti", "--data_path", str(data), "--gt_path", str(gt), "--out", out])
    with open(out) as f, open(EXAMPLE) as g:
        assert f.read() == g.read(), "generator output differs from the canonical format"


def test_generated_split_parses_and_loads(tmp_path):
    """Generator -> parse_filenames_file -> loader roundtrip (no format drift)."""
    from bts_tpu.data.dataloader import parse_filenames_file

    data = tmp_path / "kitti"
    gt = tmp_path / "kitti_gt"
    drive = "2011_09_28/2011_09_28_drive_0001_sync"
    _png(str(data / drive / "image_02/data/0000000001.png"))
    _png(
        str(gt / "2011_09_28_drive_0001_sync/proj_depth/groundtruth/image_02/0000000001.png"),
        shape=(8, 8),
        dtype=np.uint16,
    )
    out = str(tmp_path / "split.txt")
    _run(["--dataset", "kitti", "--data_path", str(data), "--gt_path", str(gt), "--out", out])
    samples = parse_filenames_file(out, str(data), str(gt))
    assert len(samples) == 1
    assert samples[0].focal == 707.0493  # per-drive-date focal table
    assert os.path.exists(samples[0].image_path)
    assert os.path.exists(samples[0].depth_path)


def test_nyu_generator_format(tmp_path):
    from bts_tpu.data.dataloader import parse_filenames_file

    data = tmp_path / "nyu"
    scene = "kitchen_0001"
    _png(str(data / scene / "rgb_00045.jpg"))
    _png(str(data / scene / "sync_depth_00045.png"), shape=(8, 8), dtype=np.uint16)
    out = str(tmp_path / "split.txt")
    _run(["--dataset", "nyu", "--data_path", str(data), "--gt_path", str(data), "--out", out])
    with open(out) as f:
        lines = f.read().splitlines()
    assert lines == [f"{scene}/rgb_00045.jpg {scene}/sync_depth_00045.png 518.8579"]
    samples = parse_filenames_file(out, str(data), str(data))
    assert samples[0].focal == 518.8579
