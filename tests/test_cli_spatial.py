"""End-to-end CLI drive of the 2-D spatial decomposition (SURVEY.md §2
parallelism checklist; §8 round-3 addendum).

Train one epoch with --spatial_shards 2 --spatial_shards_w 2 on real NYU
geometry (480x640 PNGs -> 427x565 odd-height border crop, exercising the
batch-only input-layout fallback), then run 2-D spatial inference through
bts_test — all via the public CLI entrypoints on the 8-device virtual mesh.
"""

import os

import numpy as np
import pytest
from PIL import Image

from bts_tpu.cli.bts_main import main as train_main
from bts_tpu.cli.bts_test import main as bts_test_cli


@pytest.mark.slow
def test_train_and_infer_2d_spatial(tmp_path):
    root = tmp_path
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(3):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        d = (rng.uniform(0.5, 9.5, (480, 640)) * 1000).astype(np.uint16)
        Image.fromarray(img).save(root / "rgb" / f"{i}.png")
        Image.fromarray(d).save(root / "depth" / f"{i}.png")
        lines.append(f"rgb/{i}.png depth/{i}.png 518.8579")
    (root / "split.txt").write_text("\n".join(lines))

    common = [
        "--dataset", "nyu", "--encoder", "mobilenetv2_bts", "--bts_size", "64",
        "--max_depth", "10", "--data_path", str(root), "--gt_path", str(root),
        "--filenames_file", f"{root}/split.txt", "--compute_dtype", "float32",
    ]
    assert train_main(common + [
        "--mode", "train", "--model_name", "sp2d", "--input_height", "64",
        "--input_width", "96", "--batch_size", "2", "--num_epochs", "1",
        "--log_freq", "1", "--save_freq", "2",
        "--log_directory", f"{root}/runs",
        "--spatial_shards", "2", "--spatial_shards_w", "2",
    ]) == 0
    ckpt = f"{root}/runs/sp2d/ckpt"
    assert os.path.isdir(ckpt)

    assert bts_test_cli(common + [
        "--checkpoint_path", ckpt, "--out_path", f"{root}/preds",
        "--spatial_shards", "2", "--spatial_shards_w", "2",
    ]) == 0
    preds = os.listdir(f"{root}/preds/raw")
    assert len(preds) == 3
    arr = np.array(Image.open(f"{root}/preds/raw/{preds[0]}"))
    assert arr.dtype == np.uint16 and 0 < arr.max() <= 10_000


def test_indivisible_input_height_rejected(tmp_path):
    (tmp_path / "split.txt").write_text("a.png b.png 518.8\n")
    with pytest.raises(SystemExit, match="not divisible"):
        train_main([
            "--mode", "train", "--model_name", "bad", "--encoder",
            "mobilenetv2_bts", "--dataset", "nyu", "--max_depth", "10",
            "--data_path", str(tmp_path), "--gt_path", str(tmp_path),
            "--filenames_file", f"{tmp_path}/split.txt",
            "--input_height", "63", "--input_width", "96",
            "--batch_size", "2", "--log_directory", f"{tmp_path}/runs",
            "--spatial_shards", "2",
        ])
