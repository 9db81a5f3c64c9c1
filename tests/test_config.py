from bts_tpu.config import Config, parse_args


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.variance_focus == 0.85
    assert cfg.adam_eps == 1e-3
    assert cfg.end_lr == 0.1 * cfg.learning_rate  # end_learning_rate=-1 rule


def test_parse_flags():
    cfg = parse_args(
        ["--dataset", "nyu", "--max_depth", "10", "--do_random_rotate", "--degree", "2.5"]
    )
    assert cfg.dataset == "nyu"
    assert cfg.max_depth == 10.0
    assert cfg.do_random_rotate is True
    assert cfg.degree == 2.5


def test_argfile_both_syntaxes(tmp_path):
    f = tmp_path / "arguments_train_nyu.txt"
    f.write_text(
        "--mode train\n"
        "--dataset nyu\n"
        "--encoder densenet161_bts\n"
        "--input_height 416 --input_width 544\n"
        "--max_depth 10\n"
        "# a comment line\n"
        "--batch_size 16\n"
    )
    for argv in (["@" + str(f)], [str(f)]):
        cfg = parse_args(argv)
        assert cfg.dataset == "nyu"
        assert (cfg.input_height, cfg.input_width) == (416, 544)
        assert cfg.batch_size == 16
        assert cfg.encoder == "densenet161_bts"


def test_encoder_pad_resolution_and_sidecar(tmp_path):
    """encoder_pad='auto' resolves to torch geometry only for torch
    --pretrained_model runs; the train sidecar records the resolution and
    restore-side drivers adopt it (a checkpoint fine-tuned from torch
    weights must be evaluated torch-aligned — tests/test_torch_oracle.py
    shows SAME applies them one pixel off)."""
    import json
    import os

    from bts_tpu.config import (
        Config,
        adopt_sidecar_geometry,
        resolved_encoder_pad,
        write_config_sidecar,
    )

    assert resolved_encoder_pad(Config()) == "same"
    assert resolved_encoder_pad(Config(pretrained_model="enc.pth")) == "torch"
    assert resolved_encoder_pad(Config(encoder_pad="same", pretrained_model="enc.pth")) == "same"

    # train writes the sidecar next to the ckpt dir; test adopts it
    logdir = os.path.join(tmp_path, "runs", "m1")
    path = write_config_sidecar(Config(pretrained_model="enc.pth"), logdir)
    assert json.load(open(path))["encoder_pad_resolved"] == "torch"
    restored = adopt_sidecar_geometry(
        Config(mode="test", checkpoint_path=os.path.join(logdir, "ckpt"))
    )
    assert restored.encoder_pad == "torch"
    # explicit flag wins; absent sidecar leaves 'auto' untouched
    explicit = Config(mode="test", encoder_pad="same", checkpoint_path=os.path.join(logdir, "ckpt"))
    assert adopt_sidecar_geometry(explicit).encoder_pad == "same"
    assert adopt_sidecar_geometry(Config(mode="test")).encoder_pad == "auto"


def test_warn_b4_anomaly(capsys):
    """Inference drivers warn on the known-bad batch-4 point (PERFORMANCE.md
    batch sweep: 12% below b1 per-image on v5e); training and other batch
    sizes stay silent."""
    from bts_tpu.config import Config, warn_b4_anomaly

    assert warn_b4_anomaly(Config(mode="test", batch_size=4))
    assert "batch 4" in capsys.readouterr().out
    assert warn_b4_anomaly(Config(mode="sequence", batch_size=4))
    assert not warn_b4_anomaly(Config(mode="test", batch_size=8))
    assert not warn_b4_anomaly(Config(mode="train", batch_size=4))
