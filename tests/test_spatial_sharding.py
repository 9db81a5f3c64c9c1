"""Spatial (height) sharding over the model mesh axis matches unsharded.

GSPMD must partition the conv pyramid over H with automatic halo exchange;
outputs must be numerically identical to the single-device forward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.config import Config
from bts_tpu.models import BtsModel
from bts_tpu.parallel.mesh import create_mesh, replicated_sharding, spatial_sharding
from bts_tpu.training.trainer import make_eval_step


def test_spatial_shard_matches_single():
    cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                 bts_size=64, compute_dtype="float32")
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth, num_features=cfg.bts_size)
    h, w = 64, 96
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), False)
    params, stats = variables["params"], variables["batch_stats"]
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)

    single = make_eval_step(model, cfg)
    ref = np.asarray(single(params, stats, jnp.asarray(images)))

    mesh = create_mesh(model_axis=4)  # 2 data x 4 model over 8 CPU devices
    assert mesh.shape["model"] == 4
    repl = replicated_sharding(mesh)
    p2 = jax.device_put(params, repl)
    s2 = jax.device_put(stats, repl)
    imgs = jax.device_put(jnp.asarray(images), spatial_sharding(mesh))
    sharded_step = make_eval_step(model, cfg, mesh=mesh, spatial=True)
    out = sharded_step(p2, s2, imgs)
    assert out.sharding.spec == spatial_sharding(mesh).spec
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
