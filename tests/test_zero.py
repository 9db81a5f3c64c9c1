"""ZeRO-1 optimizer-state sharding (--shard_opt_state) matches replicated.

The AdamW m/v are sharded over the ``data`` mesh axis purely via sharding
annotations (parallel.mesh.zero1_sharding); XLA reduce-scatters gradients
into the sharded update and all-gathers the applied params.  The training
trajectory must be numerically identical (up to f32 reduction order) to the
fully-replicated layout, and the optimizer leaves must actually be sharded.
SURVEY.md §2.11: the reference's MirroredStrategy replicates optimizer slots
on every replica — this is a TPU-native extension.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.config import Config
from bts_tpu.models import BtsModel
from bts_tpu.parallel.mesh import (
    create_mesh,
    replicated_sharding,
    shard_batch,
    zero1_sharding,
)
from bts_tpu.training.optimizer import make_optimizer
from bts_tpu.training.trainer import (
    TrainState,
    make_train_step,
    zero1_state_shardings,
)


def _tiny_setup(batch=8, h=40, w=72):
    cfg = Config(
        dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0, bts_size=64,
        compute_dtype="float32", input_height=32, input_width=64,
        batch_size=batch, do_random_rotate=True, degree=2.5,
    )
    model = BtsModel(
        encoder_name=cfg.encoder, max_depth=cfg.max_depth, num_features=cfg.bts_size
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3)), True)
    tx = make_optimizer(cfg, total_steps=10)
    rng = np.random.default_rng(0)
    host_batch = {
        "image": rng.integers(0, 255, (batch, h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(0.5, 9.5, (batch, h, w)).astype(np.float32),
        "focal": np.full((batch,), 518.8579, np.float32),
    }
    return cfg, model, variables, tx, host_batch


def test_zero1_sharding_layout():
    """Leaves with a data-divisible axis shard; scalars stay replicated."""
    mesh = create_mesh()  # 8 data
    n = mesh.shape["data"]
    tree = {
        "kernel": jnp.zeros((3, 3, 4, 16 * n)),
        "bias": jnp.zeros((16 * n,)),
        "odd": jnp.zeros((3,)),  # undividable
        "count": jnp.zeros(()),  # scalar
    }
    sh = zero1_sharding(mesh, tree)
    assert sh["kernel"].spec == jax.sharding.PartitionSpec(None, None, None, "data")
    assert sh["bias"].spec == jax.sharding.PartitionSpec("data")
    assert sh["odd"].is_fully_replicated
    assert sh["count"].is_fully_replicated


def test_zero1_train_matches_replicated():
    """3 fused train steps (augment+fwd+silog+bwd+AdamW) with sharded vs
    replicated optimizer state: identical losses and final params (f32
    reduction-order tolerance), and the m/v leaves really are sharded."""
    cfg, model, variables, tx, host_batch = _tiny_setup()
    mesh = create_mesh()  # 8 data devices
    repl = replicated_sharding(mesh)
    key = jax.random.PRNGKey(7)
    batch = shard_batch(host_batch, mesh)

    def run(state_shardings):
        st = TrainState.create(jax.tree.map(jnp.array, variables), tx)
        st = jax.device_put(st, state_shardings if state_shardings is not None else repl)
        step = make_train_step(
            model, tx, cfg, mesh=mesh, augment=True, state_shardings=state_shardings
        )
        losses = []
        for _ in range(3):
            st, m = step(st, batch, key)
            losses.append(float(m["loss"]))
        return st, losses

    st_ref, losses_ref = run(None)

    st0 = TrainState.create(jax.tree.map(jnp.array, variables), tx)
    zsh = zero1_state_shardings(mesh, st0)
    st_z, losses_z = run(zsh)

    np.testing.assert_allclose(losses_z, losses_ref, rtol=1e-5)
    for ref_leaf, z_leaf in zip(
        jax.tree.leaves(st_ref.params), jax.tree.leaves(st_z.params)
    ):
        np.testing.assert_allclose(
            np.asarray(z_leaf), np.asarray(ref_leaf), rtol=1e-4, atol=1e-6
        )
    sharded = [
        l for l in jax.tree.leaves(st_z.opt_state)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert sharded, "no optimizer-state leaf ended up sharded"
    # the big m/v leaves (mirroring conv kernels) must be among them
    assert max(l.size for l in sharded) == max(
        l.size for l in jax.tree.leaves(st_z.opt_state)
    )


def test_zero1_composes_with_spatial():
    """--shard_opt_state x --spatial_shards: opt state sharded over `data`
    while activations are H-sharded over `model` (dp=4 x sp=2).  The
    trajectory must match the replicated-opt-state spatial run (identical
    batch layout — only the optimizer layout differs), and m/v must shard."""
    from bts_tpu.parallel.mesh import shard_batch_spatial

    cfg, model, variables, tx, host_batch = _tiny_setup()
    mesh = create_mesh(model_axis=2)  # 4 data x 2 model
    key = jax.random.PRNGKey(3)
    batch = shard_batch_spatial(host_batch, mesh)

    def run(state_shardings):
        st = TrainState.create(jax.tree.map(jnp.array, variables), tx)
        st = jax.device_put(
            st, state_shardings if state_shardings is not None
            else replicated_sharding(mesh))
        step = make_train_step(model, tx, cfg, mesh=mesh, augment=True,
                               spatial=True, state_shardings=state_shardings)
        losses = []
        for _ in range(2):
            st, m = step(st, batch, key)
            losses.append(float(m["loss"]))
        return st, losses

    st_ref, losses_ref = run(None)
    st0 = TrainState.create(jax.tree.map(jnp.array, variables), tx)
    st_z, losses_z = run(zero1_state_shardings(mesh, st0))

    np.testing.assert_allclose(losses_z, losses_ref, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_ref.params), jax.tree.leaves(st_z.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(st_z.opt_state)
    )


def test_zero1_composes_with_grad_accum():
    """--shard_opt_state x --grad_accum_steps 2: the lax.scan microbatch
    accumulation runs against replicated params while the single optimizer
    update reads/writes data-sharded m/v.

    Parity convention (CLAUDE.md): the ZeRO layout changes the gradient
    all-reduce into a reduce-scatter, so the f32 summation ORDER differs and
    BN-train backward (1/sigma) amplifies that noise into the grads — exact
    leaf equality is the wrong assert for a train-mode step (measured here:
    step-1 loss bit-identical, step-2 loss diff 2e-6 rel, per-param drift
    <= ~1 AdamW update quantum = lr per step).  Assert the trajectory
    instead: step-1 loss identical (same pre-update state and batch layout),
    step-2 loss tight, params within a few update quanta, m/v sharded."""
    cfg, model, variables, tx, host_batch = _tiny_setup()
    cfg = cfg.replace(grad_accum_steps=2)
    mesh = create_mesh()
    key = jax.random.PRNGKey(5)
    batch = shard_batch(host_batch, mesh)

    def run(state_shardings):
        st = TrainState.create(jax.tree.map(jnp.array, variables), tx)
        st = jax.device_put(
            st, state_shardings if state_shardings is not None
            else replicated_sharding(mesh))
        step = make_train_step(model, tx, cfg, mesh=mesh, augment=True,
                               state_shardings=state_shardings)
        losses = []
        for _ in range(2):
            st, m = step(st, batch, key)
            losses.append(float(m["loss"]))
        return st, losses

    st_ref, losses_ref = run(None)
    st0 = TrainState.create(jax.tree.map(jnp.array, variables), tx)
    st_z, losses_z = run(zero1_state_shardings(mesh, st0))

    np.testing.assert_allclose(losses_z[0], losses_ref[0], rtol=1e-6)
    np.testing.assert_allclose(losses_z[1], losses_ref[1], rtol=1e-4)
    lr = cfg.learning_rate
    for a, b in zip(jax.tree.leaves(st_ref.params), jax.tree.leaves(st_z.params)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=4 * lr)
    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(st_z.opt_state)
    )


def test_zero1_trainer_and_checkpoint_roundtrip(tmp_path):
    """Trainer wiring: --shard_opt_state re-jits the step with ZeRO
    shardings from init_state on; orbax save/restore preserves both values
    and the sharded layout (restore follows the template's shardings)."""
    from bts_tpu.training.trainer import Trainer
    from bts_tpu.utils.checkpoint import CheckpointManager

    cfg, model, _, _, host_batch = _tiny_setup()
    cfg = cfg.replace(shard_opt_state=True)
    mesh = create_mesh()
    trainer = Trainer(model, cfg, total_steps=10, mesh=mesh, augment=True)
    state = trainer.init_state(host_batch)
    sharded = [
        l for l in jax.tree.leaves(state.opt_state)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    ]
    assert sharded, "Trainer.init_state did not shard the optimizer state"

    state, metrics = trainer.train_step(
        state, shard_batch(host_batch, mesh), jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["loss"]))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(int(state.step), state)
    mgr.wait()
    template = trainer.init_state(host_batch)
    restored = mgr.restore(template)
    mgr.close()
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if hasattr(b, "sharding"):
            assert b.sharding.is_fully_replicated == a.sharding.is_fully_replicated


def test_zero1_elastic_restore_across_device_counts(tmp_path):
    """Elastic resume: checkpoints are device_get-gathered before save, so a
    run saved on N devices must restore onto a DIFFERENT mesh — fewer data
    shards (preempted pod restarted smaller) or a different layout — with
    identical values, and training must continue there.  SURVEY.md §5
    failure recovery; no reference counterpart (tf.distribute pins the
    replica count)."""
    from bts_tpu.training.trainer import Trainer
    from bts_tpu.utils.checkpoint import CheckpointManager

    cfg, model, _, _, host_batch = _tiny_setup()
    cfg = cfg.replace(shard_opt_state=True)
    mesh8 = create_mesh()  # 8 data shards
    trainer8 = Trainer(model, cfg, total_steps=10, mesh=mesh8, augment=True)
    state = trainer8.init_state(host_batch)
    state, _ = trainer8.train_step(
        state, shard_batch(host_batch, mesh8), jax.random.PRNGKey(0)
    )
    mgr = CheckpointManager(str(tmp_path / "ckpt"), async_save=False)
    mgr.save(int(state.step), state)
    mgr.wait()
    want = jax.device_get(state)

    # (a) restore onto HALF the data shards, still ZeRO-1: the m/v leaves
    # land in the 4-way sharded layout with the same values
    mesh4 = create_mesh(num_devices=4)
    cfg4 = cfg.replace(batch_size=4)
    trainer4 = Trainer(model, cfg4, total_steps=10, mesh=mesh4, augment=True)
    tpl4 = trainer4.init_state({k: v[:4] for k, v in host_batch.items()})
    restored4 = mgr.restore(tpl4)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(jax.device_get(restored4))):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert any(
        hasattr(l, "sharding") and not l.sharding.is_fully_replicated
        for l in jax.tree.leaves(restored4.opt_state)
    ), "restore dropped the ZeRO-1 sharding of the smaller mesh"
    # training continues on the smaller mesh from the restored state
    batch4 = {k: v[:4] for k, v in host_batch.items()}
    st4, m4 = trainer4.train_step(
        restored4, shard_batch(batch4, mesh4), jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(m4["loss"]))
    assert int(st4.step) == int(state.step) + 1

    # (b) restore onto a 2-device REPLICATED layout (ZeRO off): same values,
    # fully-replicated leaves
    mesh2 = create_mesh(num_devices=2)
    cfg2 = cfg.replace(batch_size=2, shard_opt_state=False)
    trainer2 = Trainer(model, cfg2, total_steps=10, mesh=mesh2, augment=True)
    tpl2 = trainer2.init_state({k: v[:2] for k, v in host_batch.items()})
    restored2 = mgr.restore(tpl2)
    mgr.close()
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(jax.device_get(restored2))):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    assert all(
        l.sharding.is_fully_replicated
        for l in jax.tree.leaves(restored2.opt_state)
        if hasattr(l, "sharding")
    )
