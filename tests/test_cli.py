"""End-to-end CLI drive: train -> test -> eval on a tiny synthetic NYU set.

The regression version of the manual verify drive: exercises arg-file
parsing, the dataloader (native C++ path when available), the jitted
augment+train step, orbax save/restore, prediction PNG writing, and the
9-metric eval — all through the public CLI entrypoints.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from bts_tpu.cli.bts_eval import main as eval_main
from bts_tpu.cli.bts_main import main as train_main
from bts_tpu.cli.bts_sequence import main as seq_main
from bts_tpu.cli.bts_test import main as bts_test_cli


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("btscli")
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
        d = (rng.uniform(0.5, 9.5, (480, 640)) * 1000).astype(np.uint16)
        Image.fromarray(img).save(root / "rgb" / f"{i}.png")
        Image.fromarray(d).save(root / "depth" / f"{i}.png")
        lines.append(f"rgb/{i}.png depth/{i}.png 518.8579")
    (root / "split.txt").write_text("\n".join(lines))
    (root / "args.txt").write_text(
        "\n".join(
            [
                "--mode train",
                "--model_name cli_test",
                "--encoder mobilenetv2_bts",
                "--dataset nyu",
                f"--data_path {root}",
                f"--gt_path {root}",
                f"--filenames_file {root}/split.txt",
                "--input_height 64",
                "--input_width 96",
                "--max_depth 10",
                "--batch_size 2",
                "--num_epochs 1",
                "--bts_size 64",
                "--compute_dtype float32",
                "--log_freq 1",
                "--num_devices 1",
                "--save_freq 2",
                f"--log_directory {root}/runs",
            ]
        )
    )
    return root


def test_train_test_eval_chain(fixture_dir, capsys):
    root = fixture_dir
    assert train_main([f"@{root}/args.txt"]) == 0
    ckpt = os.path.join(root, "runs", "cli_test", "ckpt")
    assert os.path.isdir(ckpt)

    common = [
        "--dataset", "nyu", "--encoder", "mobilenetv2_bts", "--bts_size", "64",
        "--max_depth", "10", "--data_path", str(root), "--gt_path", str(root),
        "--filenames_file", f"{root}/split.txt", "--compute_dtype", "float32",
    ]
    # batch 3 over 4 samples: exercises the batched forward AND the padded
    # tail batch (last sample repeated to keep the jit shape static)
    assert bts_test_cli(common + ["--checkpoint_path", ckpt, "--out_path", f"{root}/preds",
                                  "--batch_size", "3"]) == 0
    preds = os.listdir(f"{root}/preds/raw")
    assert len(preds) == 4
    # uint16 PNG round-trip in [0, 10m]
    arr = np.array(Image.open(f"{root}/preds/raw/{preds[0]}"))
    assert arr.dtype == np.uint16 and arr.max() <= 10_000

    assert eval_main(common + [
        "--out_path", f"{root}/preds/raw", "--min_depth_eval", "1e-3",
        "--max_depth_eval", "10", "--eigen_crop",
    ]) == 0
    out = capsys.readouterr().out
    assert "abs_rel" in out


def test_sequence_driver(fixture_dir):
    root = fixture_dir
    assert seq_main([
        "--dataset", "nyu", "--encoder", "mobilenetv2_bts", "--bts_size", "64",
        "--max_depth", "10", "--compute_dtype", "float32", "--batch_size", "2",
        "--image_path", f"{root}/rgb", "--out_path", f"{root}/seq_out",
    ]) == 0
    assert len(os.listdir(f"{root}/seq_out")) == 4


def test_retrain_same_dir_rejected(fixture_dir):
    root = fixture_dir
    ckpt = os.path.join(root, "runs", "cli_test", "ckpt")
    with pytest.raises(SystemExit, match="retrain"):
        train_main([f"@{root}/args.txt", "--retrain", "--checkpoint_path", ckpt])


def test_retrain_fresh_dir_and_online_eval(fixture_dir, capsys):
    """--retrain restores weights into a NEW save dir (orbax refuses step<=latest
    saves in the source dir) and online eval runs on the eval_freq cadence."""
    root = fixture_dir
    src_ckpt = os.path.join(root, "runs", "cli_test", "ckpt")
    assert train_main([
        f"@{root}/args.txt",
        "--model_name", "cli_retrain",
        "--retrain", "--checkpoint_path", src_ckpt,
        "--do_online_eval", "--eval_freq", "2",
        "--data_path_eval", str(root), "--gt_path_eval", str(root),
        "--filenames_file_eval", f"{root}/split.txt",
        "--min_depth_eval", "1e-3", "--max_depth_eval", "10",
    ]) == 0
    out = capsys.readouterr().out
    assert "retrain from" in out
    assert "eval: silog=" in out
    new_ckpt = os.path.join(root, "runs", "cli_retrain", "ckpt")
    # the retrain run actually persisted checkpoints (orbax should_save no-op bug)
    steps = [d for d in os.listdir(new_ckpt) if d.isdigit()]
    assert steps, f"no checkpoints written to {new_ckpt}"
    # best-metric tracking (reference parity): the first eval improves every
    # metric, so all 9 land in the sidecar and best checkpoints exist
    import json

    logdir = os.path.join(root, "runs", "cli_retrain")
    with open(os.path.join(logdir, "best_eval.json")) as f:
        best = json.load(f)
    from bts_tpu.evaluation.metrics import METRIC_NAMES

    assert set(best) == set(METRIC_NAMES)
    best_root = os.path.join(logdir, "ckpt_best")
    assert os.path.isdir(os.path.join(best_root, "abs_rel"))
    assert any(
        d.isdigit() for d in os.listdir(os.path.join(best_root, "abs_rel"))
    ), "no best checkpoint written"
    assert "new best @ step" in out


def test_retrain_reused_logdir_resets_and_best_restores(fixture_dir, capsys):
    """--retrain into a logdir that already ran must reset the best-metric
    bar, the per-metric best checkpoints, AND the stale main ckpt dir
    (orbax silently refuses step <= latest, so a fresh run would otherwise
    persist nothing); the weights-only best checkpoint then restores through
    the public bts_test entrypoint (advisor round-3 findings 1-3)."""
    root = fixture_dir
    logdir = os.path.join(root, "runs", "cli_retrain")
    old_bar = json.load(open(os.path.join(logdir, "best_eval.json")))

    src_ckpt = os.path.join(root, "runs", "cli_test", "ckpt")
    assert train_main([
        f"@{root}/args.txt",
        "--model_name", "cli_retrain",
        "--retrain", "--checkpoint_path", src_ckpt,
        "--do_online_eval", "--eval_freq", "2",
        "--data_path_eval", str(root), "--gt_path_eval", str(root),
        "--filenames_file_eval", f"{root}/split.txt",
        "--min_depth_eval", "1e-3", "--max_depth_eval", "10",
    ]) == 0
    out = capsys.readouterr().out
    assert "retrain: reset stale best-metric bar" in out
    assert "retrain: cleared stale checkpoints" in out
    # the fresh run re-persisted both regular and best checkpoints
    assert any(d.isdigit() for d in os.listdir(os.path.join(logdir, "ckpt")))
    new_bar = json.load(open(os.path.join(logdir, "best_eval.json")))
    assert set(new_bar) == set(old_bar)  # all 9 metrics re-established

    # weights-only best checkpoint restores through the public test driver
    best_ckpt = os.path.join(logdir, "ckpt_best", "abs_rel")
    assert bts_test_cli([
        "--dataset", "nyu", "--encoder", "mobilenetv2_bts", "--bts_size", "64",
        "--max_depth", "10", "--data_path", str(root), "--gt_path", str(root),
        "--filenames_file", f"{root}/split.txt", "--compute_dtype", "float32",
        "--checkpoint_path", best_ckpt, "--out_path", f"{root}/preds_best",
    ]) == 0
    assert len(os.listdir(f"{root}/preds_best/raw")) == 4


def test_spatial_shards_test_driver(tmp_path):
    """--spatial_shards N through bts_test: H-sharded forward (GSPMD halos
    over the model mesh axis) must write byte-identical prediction PNGs to
    the single-device run (both from the same seeded random init)."""
    rng = np.random.default_rng(3)
    (tmp_path / "rgb").mkdir()
    lines = []
    for i in range(2):
        img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / "rgb" / f"{i}.png")
        lines.append(f"rgb/{i}.png None 518.8579")
    (tmp_path / "split.txt").write_text("\n".join(lines))
    common = [
        "--dataset", "nyu", "--encoder", "mobilenetv2_bts", "--bts_size", "64",
        "--max_depth", "10", "--data_path", str(tmp_path), "--gt_path", str(tmp_path),
        "--filenames_file", f"{tmp_path}/split.txt", "--compute_dtype", "float32",
    ]
    assert bts_test_cli(common + ["--out_path", f"{tmp_path}/p1"]) == 0
    assert bts_test_cli(common + ["--out_path", f"{tmp_path}/p4", "--spatial_shards", "4"]) == 0
    names = sorted(os.listdir(f"{tmp_path}/p1/raw"))
    assert names == sorted(os.listdir(f"{tmp_path}/p4/raw")) and len(names) == 2
    for n in names:
        a = np.array(Image.open(f"{tmp_path}/p1/raw/{n}"))
        b = np.array(Image.open(f"{tmp_path}/p4/raw/{n}"))
        # uint16 quantization (x1000) absorbs reduction-order noise; allow 1 count
        assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1


def test_online_eval_batched_matches_b1(tmp_path):
    """Batched online eval (padded tail) == the batch-1 path, metric for
    metric, on a 10-image synthetic split (VERDICT r2 item 3)."""
    import jax
    import jax.numpy as jnp

    from bts_tpu.cli.bts_main import online_eval
    from bts_tpu.config import Config
    from bts_tpu.models import BtsModel
    from bts_tpu.training.trainer import make_eval_step

    rng = np.random.default_rng(7)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    lines = []
    for i in range(10):
        img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
        d = (rng.uniform(0.5, 9.5, (64, 96)) * 1000).astype(np.uint16)
        Image.fromarray(img).save(tmp_path / "rgb" / f"{i}.png")
        Image.fromarray(d).save(tmp_path / "depth" / f"{i}.png")
        lines.append(f"rgb/{i}.png depth/{i}.png 518.8579")
    (tmp_path / "split.txt").write_text("\n".join(lines))

    cfg = Config(
        dataset="nyu", encoder="mobilenetv2_bts", bts_size=64, max_depth=10.0,
        compute_dtype="float32", data_path_eval=str(tmp_path),
        gt_path_eval=str(tmp_path), filenames_file_eval=f"{tmp_path}/split.txt",
        min_depth_eval=1e-3, max_depth_eval=10.0, eigen_crop=False,
        garg_crop=False, batch_size=1,
    )
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), False)

    class _State:
        params = variables["params"]
        batch_stats = variables["batch_stats"]

    step = make_eval_step(model, cfg)
    r1 = online_eval(step, _State, cfg)
    # batch 4 over 10 samples: two full batches + a padded tail of 2
    r4 = online_eval(step, _State, cfg.replace(batch_size=4))
    assert r1 is not None and r4 is not None
    np.testing.assert_allclose(r4, r1, rtol=1e-6, atol=1e-7)
