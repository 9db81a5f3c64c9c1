"""Small-surface coverage: summary writer, pred naming, arg-file parsing."""

import numpy as np

from bts_tpu.cli.bts_test import pred_name
from bts_tpu.config import parse_args
from bts_tpu.utils.summary import SummaryWriter


def test_summary_writer_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path / "tb"))
    w.scalars(1, {"train/loss": 1.5})
    w.depth_image(1, "train/depth", np.random.rand(8, 12).astype(np.float32), 10.0)
    w.flush()
    w.close()
    files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0


def test_pred_name_collision_free():
    a = pred_name("/data/2011_09_26/image_02/data/0000000069.png", "/data")
    b = pred_name("/data/2011_09_30/image_02/data/0000000069.png", "/data")
    assert a != b
    assert "/" not in a and a.endswith("0000000069")


def test_argfile_comments_and_bare_positional(tmp_path):
    f = tmp_path / "args.txt"
    f.write_text("--dataset nyu\n# a comment line\n--max_depth 10 # trailing comment\n")
    cfg = parse_args([str(f)], mode="train")  # bare positional (upstream style)
    assert cfg.dataset == "nyu" and cfg.max_depth == 10.0
    cfg2 = parse_args([f"@{f}"], mode="train")  # argparse fromfile style
    assert cfg2.dataset == "nyu"


def test_checkpoint_manager_keeps_limited(tmp_path):
    import jax.numpy as jnp

    from bts_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "c"), max_to_keep=2, async_save=False)
    state = {"w": jnp.arange(4.0)}
    for s in (1, 2, 3):
        mgr.save(s, state)
    mgr.wait()
    assert mgr.latest_step() == 3
    restored = mgr.restore({"w": jnp.zeros(4)}, step=3)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))
    mgr.close()
