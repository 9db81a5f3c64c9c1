"""Serving export (cli/bts_export.py + utils/serving.py).

The exported artifact must reproduce the test driver's forward exactly
(same eval_preprocess + apply + focal scaling), round-trip through
serialize/deserialize, and be callable without the model code.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bts_tpu.config import Config
from bts_tpu.models import create_model
from bts_tpu.training.optimizer import make_optimizer
from bts_tpu.training.trainer import TrainState
from bts_tpu.utils.serving import load_exported


def _tiny_cfg(**kw):
    return Config(
        mode="test", encoder="mobilenetv2_bts", dataset="nyu", max_depth=10.0,
        bts_size=64, input_height=32, input_width=64, batch_size=2,
        compute_dtype="float32", **kw,
    )


def _state(cfg):
    model = create_model(cfg)
    x = jnp.zeros((cfg.batch_size, cfg.input_height, cfg.input_width, 3))
    variables = jax.jit(lambda k, xx: model.init(k, xx, False))(jax.random.PRNGKey(0), x)
    return model, TrainState.create(variables, make_optimizer(cfg, 1))


@pytest.mark.parametrize("dataset", ["nyu", "kitti"])
def test_export_roundtrip_matches_forward(tmp_path, dataset):
    from bts_tpu.cli.bts_export import export_serving_fn
    from bts_tpu.data.augment import eval_preprocess

    cfg = _tiny_cfg().replace(dataset=dataset, max_depth=80.0 if dataset == "kitti" else 10.0)
    model, state = _state(cfg)
    blob = export_serving_fn(cfg, state)
    path = os.path.join(tmp_path, "m.stablehlo")
    with open(path, "wb") as f:
        f.write(blob)

    serve = load_exported(path)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (cfg.batch_size, 32, 64, 3), dtype=np.uint8)
    )
    focal = jnp.asarray([600.0, 715.0873], jnp.float32)
    args = (images, focal) if dataset == "kitti" else (images,)
    got = np.asarray(serve(*args))

    *_, want = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        eval_preprocess(images), False,
        focal=focal if dataset == "kitti" else None,
    )
    # identical math modulo XLA reassociation between the in-process jit
    # and the deserialized executable (measured max 1.4e-6 on CPU)
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=2e-5)
    assert got.shape == (cfg.batch_size, 32, 64, 1)
    # introspection surface survives the round trip
    assert serve.exported.in_avals[0].shape == (cfg.batch_size, 32, 64, 3)


def test_export_rejects_wrong_shape(tmp_path):
    from bts_tpu.cli.bts_export import export_serving_fn

    cfg = _tiny_cfg()
    _, state = _state(cfg)
    path = os.path.join(tmp_path, "m.stablehlo")
    with open(path, "wb") as f:
        f.write(export_serving_fn(cfg, state))
    serve = load_exported(path)
    bad = jnp.zeros((1, 32, 64, 3), jnp.uint8)  # batch 1 != exported 2
    with pytest.raises(Exception):
        serve(bad)


def test_export_cli_end_to_end(tmp_path):
    out = os.path.join(tmp_path, "model.stablehlo")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [
            sys.executable, "-m", "bts_tpu.cli.bts_export",
            "--model_name", "export_test", "--encoder", "mobilenetv2_bts",
            "--dataset", "nyu", "--max_depth", "10", "--bts_size", "64",
            "--input_height", "32", "--input_width", "64", "--batch_size", "1",
            "--compute_dtype", "float32", "--export_path", out,
            # the dev box's sitecustomize pins an axon TPU platform (env
            # vars alone don't switch it); lower for CPU explicitly so the
            # artifact is callable in this CPU test process
            "--export_platforms", "cpu",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    serve = load_exported(out)
    d = np.asarray(serve(jnp.zeros((1, 32, 64, 3), jnp.uint8)))
    assert d.shape == (1, 32, 64, 1) and np.isfinite(d).all()
    assert 0 < d.min() and d.max() < 10.0
