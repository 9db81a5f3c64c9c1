import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from bts_tpu.config import Config
from bts_tpu.models import BtsModel
from bts_tpu.parallel.mesh import create_mesh, shard_batch
from bts_tpu.training.optimizer import make_optimizer, polynomial_schedule
from bts_tpu.training.trainer import TrainState, make_eval_step, make_train_step


def tiny_cfg(**kw):
    base = dict(
        dataset="nyu",
        encoder="mobilenetv2_bts",
        max_depth=10.0,
        bts_size=128,
        input_height=32,
        input_width=64,
        batch_size=8,
        learning_rate=1e-4,
        do_random_rotate=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return Config(**base)


def tiny_model(cfg, **kw):
    return BtsModel(
        encoder_name=cfg.encoder, max_depth=cfg.max_depth, num_features=cfg.bts_size, **kw
    )


def make_batch(rng, b, h, w):
    return {
        "image": rng.integers(0, 255, size=(b, h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(0.2, 9.0, size=(b, h, w)).astype(np.float32),
        "focal": np.full((b,), 518.8579, np.float32),
    }


def test_polynomial_schedule_reference_formula():
    sched = polynomial_schedule(1e-4, 1e-5, 100, power=0.9)
    assert np.isclose(float(sched(0)), 1e-4)
    assert np.isclose(float(sched(100)), 1e-5)
    expected_mid = (1e-4 - 1e-5) * (1 - 50 / 100) ** 0.9 + 1e-5
    assert np.isclose(float(sched(50)), expected_mid, rtol=1e-6)


def test_train_step_reduces_loss(rng):
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    tx = make_optimizer(cfg, total_steps=50)
    batch = make_batch(rng, 4, 40, 72)  # pre-crop geometry > input size
    init_img = jnp.zeros((4, cfg.input_height, cfg.input_width, 3))
    variables = model.init(jax.random.PRNGKey(0), init_img, True)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, cfg, mesh=None, augment=True)
    key = jax.random.PRNGKey(0)
    losses = []
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    for _ in range(8):
        state, metrics = step(state, jb, key)
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


@pytest.mark.parametrize("upconv_bwd", ["literal", "dilated"])
def test_train_step_data_parallel_mesh_matches_single(rng, upconv_bwd):
    """DP over the 8-device CPU mesh must match single-device numerics.

    Parametrized over both UpConv gradient lowerings: "dilated" (the
    AD-derived backward create_model selects for unsharded/pure-DP
    training) must partition correctly under batch sharding — the GSPMD
    mis-partitioning only bites when H/W are sharded
    (layers._DilatedUpConv)."""
    cfg = tiny_cfg()
    model = tiny_model(cfg, upconv_bwd=upconv_bwd)
    tx = make_optimizer(cfg, total_steps=50)
    batch = make_batch(rng, 8, 40, 72)
    init_img = jnp.zeros((8, cfg.input_height, cfg.input_width, 3))
    variables = model.init(jax.random.PRNGKey(0), init_img, True)
    key = jax.random.PRNGKey(0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    # The train step donates its state argument; give each state its own
    # buffers (device_put may zero-copy the device-0 shard) so donation in
    # step_a can't delete arrays state_b still references.
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    from bts_tpu.parallel.mesh import replicated_sharding

    state_b = jax.device_put(TrainState.create(variables, tx), replicated_sharding(mesh))

    state_a = TrainState.create(jax.tree.map(jnp.copy, variables), tx)
    step_a = make_train_step(model, tx, cfg, mesh=None, augment=True)
    state_a, m_a = step_a(state_a, jb, key)
    step_b = make_train_step(model, tx, cfg, mesh=mesh, augment=True)
    state_b, m_b = step_b(state_b, shard_batch(jb, mesh), key)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    # spot-check a parameter tensor after update
    pa = jax.tree.leaves(state_a.params)[0]
    pb = jax.tree.leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_eval_step_shapes(rng):
    cfg = tiny_cfg()
    model = tiny_model(cfg)
    tx = make_optimizer(cfg, 10)
    init_img = jnp.zeros((1, 32, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), init_img, True)
    state = TrainState.create(variables, tx)
    ev = make_eval_step(model, cfg)
    out = ev(state.params, state.batch_stats, jnp.asarray(make_batch(rng, 2, 32, 64)["image"]))
    assert out.shape == (2, 32, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_roundtrip(tmp_path, rng):
    from bts_tpu.utils.checkpoint import CheckpointManager, restore_for_retrain

    cfg = tiny_cfg()
    model = tiny_model(cfg)
    tx = make_optimizer(cfg, 10)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), True)
    state = TrainState.create(variables, tx).replace(step=jnp.asarray(7, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(7, state)
    mgr.wait()
    assert mgr.latest_step() == 7

    template = TrainState.create(variables, tx)
    restored = mgr.restore(template)
    assert int(restored.step) == 7
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(restored.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]),
    )
    # --retrain: weights restored, step reset
    rt = restore_for_retrain(mgr, template)
    assert int(rt.step) == 0
    mgr.close()


def test_checkpoint_restore_preserves_mesh_sharding(tmp_path, rng):
    """Restoring through a mesh-sharded template must hand back arrays with
    the template's shardings (orbax StandardRestore respects the template) —
    the multi-host resume path in bts_main restores AFTER the state is
    placed on the mesh, so a silent reshard-to-host here would break pod
    resume."""
    from bts_tpu.parallel.mesh import create_mesh, replicated_sharding
    from bts_tpu.utils.checkpoint import CheckpointManager

    cfg = tiny_cfg()
    model = tiny_model(cfg)
    tx = make_optimizer(cfg, 10)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), True)
    mesh = create_mesh()
    sh = replicated_sharding(mesh)
    state = jax.device_put(TrainState.create(variables, tx), sh)
    state = state.replace(step=jnp.asarray(3, jnp.int32))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(3, state)
    mgr.wait()

    template = jax.device_put(TrainState.create(variables, tx), sh)
    restored = mgr.restore(template)
    assert int(restored.step) == 3
    leaf = jax.tree.leaves(restored.params)[0]
    assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(jax.tree.leaves(state.params)[0])
    )
    mgr.close()


def test_profile_trace_closed_when_run_ends_before_stop_step(tmp_path, rng):
    """--profile traces steps 10..15; a run that ends at num_steps=12 must
    still CLOSE the trace (round-4 verdict #5: an unclosed
    jax.profiler.start_trace leaks the session and writes nothing usable).
    Asserts (a) a complete .xplane.pb landed on disk and (b) the global
    profiler session is closed (a fresh start_trace would raise if not)."""
    import glob

    from bts_tpu.training.trainer import Trainer

    cfg = tiny_cfg(batch_size=2, num_epochs=1)
    trainer = Trainer(cfg=cfg, model=tiny_model(cfg), total_steps=20, augment=True)
    batch = {
        k: jnp.asarray(v) for k, v in make_batch(rng, 2, 40, 72).items()
    }
    state = trainer.init_state(batch)
    profile_dir = str(tmp_path / "prof")
    state = trainer.run(
        state, iter([batch] * 12), num_steps=12, profile_dir=profile_dir
    )
    assert int(state.step) == 12
    planes = glob.glob(f"{profile_dir}/**/*.xplane.pb", recursive=True)
    assert planes, f"no trace written under {profile_dir}"
    assert all(os.path.getsize(p) > 0 for p in planes)
    # the session must be closed: start_trace raises if one is still open
    jax.profiler.start_trace(str(tmp_path / "prof2"))
    jax.profiler.stop_trace()


def test_grad_accum_duplicated_microbatch_exact(rng):
    """With frozen BN, no augmentation, and the delivered batch = the same
    microbatch stacked twice, averaged microbatch grads equal the single-
    microbatch grads exactly — so the accum=2 step must reproduce the
    accum=1 step on one copy bit-for-bit (f32)."""
    cfg1 = tiny_cfg(batch_size=4, bn_no_track_stats=True)
    cfg2 = cfg1.replace(batch_size=8, grad_accum_steps=2)
    model = tiny_model(cfg1)
    tx = make_optimizer(cfg1, total_steps=50)
    micro = make_batch(rng, 4, 32, 64)
    dup = {k: np.concatenate([v, v]) for k, v in micro.items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 32, 64, 3)), True)
    key = jax.random.PRNGKey(3)

    state_1 = TrainState.create(jax.tree.map(jnp.copy, variables), tx)
    step_1 = make_train_step(model, tx, cfg1, augment=False)
    # accum=1 derives its augment key as fold_in(step_key, 0) only when
    # accum>1; with augment=False the key never reaches any RNG, so the two
    # paths see identical math
    state_1, m_1 = step_1(state_1, {k: jnp.asarray(v) for k, v in micro.items()}, key)

    state_2 = TrainState.create(jax.tree.map(jnp.copy, variables), tx)
    step_2 = make_train_step(model, tx, cfg2, augment=False)
    state_2, m_2 = step_2(state_2, {k: jnp.asarray(v) for k, v in dup.items()}, key)

    np.testing.assert_allclose(float(m_1["loss"]), float(m_2["loss"]), rtol=1e-6)
    for pa, pb in zip(jax.tree.leaves(state_1.params), jax.tree.leaves(state_2.params)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-7)


def test_grad_accum_reduces_loss_and_updates_bn(rng):
    cfg = tiny_cfg(batch_size=8, grad_accum_steps=4)
    model = tiny_model(cfg)
    tx = make_optimizer(cfg, total_steps=50)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 8, 40, 72).items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 32, 64, 3)), True)
    state = TrainState.create(variables, tx)
    bn0 = jax.tree.leaves(state.batch_stats)[0].copy()
    step = make_train_step(model, tx, cfg, augment=True)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    # BN running stats advanced through the sequential microbatch scan
    assert not np.allclose(np.asarray(jax.tree.leaves(state.batch_stats)[0]), np.asarray(bn0))


def test_grad_accum_data_parallel_mesh_matches_single(rng):
    """accum=2 over the 8-device DP mesh vs accum=2 single-device."""
    cfg = tiny_cfg(batch_size=16, grad_accum_steps=2)
    model = tiny_model(cfg)
    tx = make_optimizer(cfg, total_steps=50)
    batch = make_batch(rng, 16, 40, 72)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((4, 32, 64, 3)), True)
    key = jax.random.PRNGKey(0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    mesh = create_mesh()
    from bts_tpu.parallel.mesh import replicated_sharding

    state_b = jax.device_put(TrainState.create(variables, tx), replicated_sharding(mesh))
    state_a = TrainState.create(jax.tree.map(jnp.copy, variables), tx)
    step_a = make_train_step(model, tx, cfg, mesh=None, augment=True)
    state_a, m_a = step_a(state_a, jb, key)
    step_b = make_train_step(model, tx, cfg, mesh=mesh, augment=True)
    state_b, m_b = step_b(state_b, shard_batch(jb, mesh), key)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-4)
    pa = jax.tree.leaves(state_a.params)[0]
    pb = jax.tree.leaves(state_b.params)[0]
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_grad_accum_rejects_indivisible_batch(rng):
    cfg = tiny_cfg(batch_size=6, grad_accum_steps=4)
    model = tiny_model(cfg)
    tx = make_optimizer(cfg, total_steps=50)
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, 6, 32, 64).items()}
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 64, 3)), True)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, cfg, augment=False)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, batch, jax.random.PRNGKey(0))
