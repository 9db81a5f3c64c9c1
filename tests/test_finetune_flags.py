"""--fix_first_conv_block(s), --bn_no_track_stats, --pretrained_model."""

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.config import Config
from bts_tpu.models import BtsModel
from bts_tpu.training.optimizer import freeze_mask, make_optimizer
from bts_tpu.training.trainer import TrainState, make_train_step


def tiny_cfg(**kw):
    base = dict(
        dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0, bts_size=64,
        input_height=32, input_width=64, batch_size=2, do_random_rotate=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


def make_batch(rng, b=2, h=32, w=64):
    return {
        "image": jnp.asarray(rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)),
        "depth": jnp.asarray(rng.uniform(0.2, 9.0, (b, h, w)).astype(np.float32)),
        "focal": jnp.full((b,), 518.8579, jnp.float32),
    }


def _setup(cfg, rng):
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth, num_features=cfg.bts_size)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 64, 3)), True)
    tx = make_optimizer(cfg, 10)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, cfg, mesh=None, augment=False)
    return model, state, step


def test_freeze_mask_scoped_to_encoder(rng):
    cfg = tiny_cfg(fix_first_conv_block=True)
    model = BtsModel(encoder_name=cfg.encoder, max_depth=10.0, num_features=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), True)
    mask = freeze_mask(variables["params"], cfg)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    frozen_paths = ["/".join(p.key for p in path) for path, v in flat if not v]
    assert frozen_paths, "nothing frozen"
    assert all(p.startswith("MobileNetV2_0/") for p in frozen_paths)
    # stem + first stage frozen, decoder untouched
    assert any("Conv_0/kernel" in p for p in frozen_paths)
    assert any("InvertedResidual_0" in p for p in frozen_paths)
    assert not any("InvertedResidual_1/" in p for p in frozen_paths)


def test_frozen_params_do_not_move(rng):
    cfg = tiny_cfg(fix_first_conv_block=True)
    _, state, step = _setup(cfg, rng)
    p0 = jax.device_get(state.params)
    state, _ = step(state, make_batch(rng), jax.random.PRNGKey(0))
    p1 = jax.device_get(state.params)
    stem0 = p0["MobileNetV2_0"]["Conv_0"]["kernel"]
    stem1 = p1["MobileNetV2_0"]["Conv_0"]["kernel"]
    np.testing.assert_array_equal(stem0, stem1)
    # unfrozen encoder stage does move
    m0 = p0["MobileNetV2_0"]["InvertedResidual_1"]["Conv_0"]["kernel"]
    m1 = p1["MobileNetV2_0"]["InvertedResidual_1"]["Conv_0"]["kernel"]
    assert np.abs(m1 - m0).max() > 0
    # decoder moves
    d0 = jax.tree.leaves(p0["BtsDecoder_0"])[0]
    d1 = jax.tree.leaves(p1["BtsDecoder_0"])[0]
    assert np.abs(np.asarray(d1) - np.asarray(d0)).max() > 0


def test_bn_no_track_stats_keeps_stats(rng):
    cfg = tiny_cfg(bn_no_track_stats=True)
    _, state, step = _setup(cfg, rng)
    bs0 = jax.device_get(state.batch_stats)
    new_state, _ = step(state, make_batch(rng), jax.random.PRNGKey(0))
    bs1 = jax.device_get(new_state.batch_stats)
    for a, b in zip(jax.tree.leaves(bs0), jax.tree.leaves(bs1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pretrained_npz_roundtrip(tmp_path, rng):
    """--pretrained_model with an .npz of torchvision-keyed arrays."""
    from bts_tpu.models.encoders import build_encoder
    from bts_tpu.utils.torch_converter import (
        ENCODER_MAPPINGS, flax_to_torch_tensor, jax_to_py, load_pretrained_encoder,
    )

    name = "mobilenetv2_bts"
    enc = build_encoder(name)
    enc_vars = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 64, 3)), True)
    g = np.random.default_rng(1)
    sd = {}
    for flax_path, torch_key, kind in ENCODER_MAPPINGS[name]():
        tree = enc_vars["batch_stats"] if flax_path[-1] in ("mean", "var") else enc_vars["params"]
        leaf = tree
        for p in flax_path:
            leaf = leaf[p]
        sd[torch_key] = flax_to_torch_tensor(
            g.standard_normal(np.shape(leaf)).astype(np.float32), kind
        )
    np.savez(tmp_path / "enc.npz", **sd)

    model = BtsModel(encoder_name=name, max_depth=10.0, num_features=64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), True)
    new_vars = load_pretrained_encoder(variables, name, str(tmp_path / "enc.npz"))
    got = np.asarray(new_vars["params"]["MobileNetV2_0"]["Conv_0"]["kernel"])
    want = sd["features.0.0.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
