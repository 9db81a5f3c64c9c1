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
