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


def test_spatial_train_matches_single():
    """Train step with H sharded over the model axis == single-device step
    (VERDICT r1 #5 / ROADMAP #4).

    Two-part proof that GSPMD inserts halos/collectives correctly end to end:

    1. The PRODUCTION fused step (augmentation + forward + silog + backward
       + AdamW, BN batch stats) must reproduce the single-device loss and
       yield a finite, advancing state.  Its f32 *gradients* are not compared
       bitwise: BN-train backward (1/sigma amplification) and silog's
       variance-focus mean subtraction are ill-conditioned to reduction
       order — verified by running the same comparison in f64, where the
       grad-norm gap collapses from ~25% to 0.016%.
    2. The same spatially-sharded backward graph with frozen BN (the
       well-conditioned path) must match single-device gradients leaf-for-
       leaf at tight f32 tolerance — this pins the spatial partitioning of
       every conv/LPG/silog backward op.
    """
    from bts_tpu.ops.silog import default_mask, silog_loss
    from bts_tpu.parallel.mesh import shard_batch_spatial
    from bts_tpu.training.optimizer import make_optimizer
    from bts_tpu.training.trainer import TrainState, make_train_step

    cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                 bts_size=64, compute_dtype="float32",
                 input_height=64, input_width=64, do_random_rotate=True,
                 degree=2.5, batch_size=2)
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size)
    h, w = 64, 96  # pre-crop geometry; augmentation crops to 64x64
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(0.5, 9.5, (2, h, w)).astype(np.float32),
        "focal": np.full((2,), 518.8579, np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), True)
    tx = make_optimizer(cfg, total_steps=10)
    key = jax.random.PRNGKey(0)
    mesh = create_mesh(model_axis=4)  # 2 data x 4 model over 8 CPU devices

    def fresh_state():
        # the train step donates its state arg; each run needs its own buffers
        return TrainState.create(jax.tree.map(jnp.array, variables), tx)

    # --- part 1: production fused step, loss parity + state advance
    single = make_train_step(model, tx, cfg)
    st_ref, m_ref = single(fresh_state(),
                           {k: jnp.asarray(v) for k, v in batch.items()}, key)
    sharded = make_train_step(model, tx, cfg, mesh=mesh, spatial=True)
    st0 = jax.device_put(fresh_state(), replicated_sharding(mesh))
    st_sp, m_sp = sharded(st0, shard_batch_spatial(batch, mesh), key)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5, atol=1e-6)
    assert int(st_sp.step) == 1
    assert np.isfinite(float(m_sp["grad_norm"]))
    for a, b in zip(jax.tree_util.tree_leaves(st_ref.params),
                    jax.tree_util.tree_leaves(st_sp.params)):
        assert np.isfinite(np.asarray(b)).all()

    # --- part 2: frozen-BN gradients, tight leaf-for-leaf parity
    params, stats = variables["params"], variables["batch_stats"]
    images = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    depths = jnp.asarray(batch["depth"])

    def loss_fn(p, imgs, dps):
        *_, final = model.apply({"params": p, "batch_stats": stats}, imgs, False)
        return silog_loss(final[..., 0], dps, default_mask(dps, cfg.dataset),
                          cfg.variance_focus)

    gfn = jax.value_and_grad(loss_fn)
    l_ref, g_ref = jax.jit(gfn)(params, images, depths)
    repl = replicated_sharding(mesh)
    sp = spatial_sharding(mesh)
    g_sp_fn = jax.jit(gfn, in_shardings=(repl, sp, sp), out_shardings=(repl, repl))
    l_sp, g_sp = g_sp_fn(jax.device_put(params, repl),
                         jax.device_put(images, sp), jax.device_put(depths, sp))
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4 * scale)


def test_pallas_lpg_spatial_sharding():
    """The Pallas LPG kernel runs INSIDE a spatially-sharded program.

    A bare pallas_call has no GSPMD partitioning rule; ops/lpg_pallas wraps
    both kernels in custom_partitioning (Shardy rule ``b h w -> b (h k)(w k)``)
    so the default TPU config (--spatial_shards N + use_pallas) is exercised
    here in interpret mode: forward AND custom-VJP backward, sharded over
    (data, model), must match the unsharded jnp oracle.
    """
    from bts_tpu.ops import lpg_pallas
    from bts_tpu.ops.lpg import lpg_reference

    old = lpg_pallas._INTERPRET
    lpg_pallas._INTERPRET = True
    try:
        mesh = create_mesh(model_axis=4)  # 2 data x 4 model
        rng = np.random.default_rng(1)
        b, h, w, k = 2, 8, 12, 8
        plane = rng.normal(size=(b, h, w, 4)).astype(np.float32)
        plane[..., 2] += 3.0  # denominators away from zero
        g = rng.normal(size=(b, h * k, w * k)).astype(np.float32)

        def fwd_sum(p):
            return (lpg_pallas.lpg(p, k) * g).sum()

        ref_out = lpg_reference(jnp.asarray(plane), k)
        ref_grad = jax.grad(lambda p: (lpg_reference(p, k) * g).sum())(
            jnp.asarray(plane)
        )

        sp_in = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data", "model"))
        repl = replicated_sharding(mesh)
        out_fn = jax.jit(
            lambda p: lpg_pallas.lpg(p, k),
            in_shardings=sp_in,
            out_shardings=jax.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data", "model")
            ),
        )
        p_sh = jax.device_put(jnp.asarray(plane), sp_in)
        out = out_fn(p_sh)
        # rtol 2e-5: interpret-mode fma ordering differs from the broadcast
        # oracle in the last ulps near small denominators
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), rtol=2e-5, atol=2e-5)

        grad_fn = jax.jit(jax.grad(fwd_sum), in_shardings=sp_in, out_shardings=repl)
        grad = grad_fn(p_sh)
        np.testing.assert_allclose(
            np.asarray(grad), np.asarray(ref_grad), rtol=1e-5, atol=1e-5
        )
    finally:
        lpg_pallas._INTERPRET = old


def test_pallas_lpg_uneven_shard_raises():
    """Uneven plane-grid sharding must fail fast, not pad silently."""
    import pytest

    from bts_tpu.ops import lpg_pallas

    old = lpg_pallas._INTERPRET
    lpg_pallas._INTERPRET = True
    try:
        mesh = create_mesh(model_axis=4)
        # h=6 cells over 4 model shards: 6 % 4 != 0
        plane = jnp.ones((2, 6, 8, 4))
        sp_in = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data", "model"))
        fn = jax.jit(lambda p: lpg_pallas.lpg(p, 4), in_shardings=sp_in)
        with pytest.raises(Exception, match="spatial_shards|sharded|divis"):
            fn(jax.device_put(plane, sp_in)).block_until_ready()
    finally:
        lpg_pallas._INTERPRET = old


def test_spatial_eval_with_pallas_interpret():
    """make_eval_step(spatial=True) with use_pallas='always' (interpret):
    the shipped --spatial_shards TPU configuration end to end."""
    from bts_tpu.ops import lpg_pallas

    old = lpg_pallas._INTERPRET
    lpg_pallas._INTERPRET = True
    try:
        cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                     bts_size=64, compute_dtype="float32", use_pallas="always")
        model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                         num_features=cfg.bts_size, use_pallas="always")
        h, w = 64, 96
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), False)
        params, stats = variables["params"], variables["batch_stats"]
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)

        single = make_eval_step(model, cfg)
        ref = np.asarray(single(params, stats, jnp.asarray(images)))

        mesh = create_mesh(model_axis=4)
        repl = replicated_sharding(mesh)
        sharded_step = make_eval_step(model, cfg, mesh=mesh, spatial=True)
        out = sharded_step(
            jax.device_put(params, repl),
            jax.device_put(stats, repl),
            jax.device_put(jnp.asarray(images), spatial_sharding(mesh)),
        )
        np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    finally:
        lpg_pallas._INTERPRET = old


def test_spatial_2d_eval_matches_single():
    """2-D spatial decomposition (--spatial_shards 2 --spatial_shards_w 2):
    H over ``model`` AND W over ``model_w`` — GSPMD must halo-exchange along
    both image axes and match the single-device forward."""
    cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                 bts_size=64, compute_dtype="float32")
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size)
    h, w = 64, 96
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), False)
    params, stats = variables["params"], variables["batch_stats"]
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)

    single = make_eval_step(model, cfg)
    ref = np.asarray(single(params, stats, jnp.asarray(images)))

    mesh = create_mesh(model_axis=2, model_w_axis=2)  # 2 data x 2 H x 2 W
    assert mesh.shape == {"data": 2, "model": 2, "model_w": 2}
    repl = replicated_sharding(mesh)
    sharded_step = make_eval_step(model, cfg, mesh=mesh, spatial=True)
    out = sharded_step(
        jax.device_put(params, repl),
        jax.device_put(stats, repl),
        jax.device_put(jnp.asarray(images), spatial_sharding(mesh)),
    )
    assert out.sharding.spec == spatial_sharding(mesh).spec
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_spatial_2d_train_matches_single():
    """The production fused train step under the 2-D (H x W) decomposition:
    loss parity vs single device, plus tight frozen-BN grad parity (the
    well-conditioned path — see test_spatial_train_matches_single)."""
    from bts_tpu.ops.silog import default_mask, silog_loss
    from bts_tpu.parallel.mesh import shard_batch_spatial
    from bts_tpu.training.optimizer import make_optimizer
    from bts_tpu.training.trainer import TrainState, make_train_step

    cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                 bts_size=64, compute_dtype="float32",
                 input_height=64, input_width=64, do_random_rotate=True,
                 degree=2.5, batch_size=2,
                 spatial_shards=2, spatial_shards_w=2)
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size)
    h, w = 64, 96
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(0.5, 9.5, (2, h, w)).astype(np.float32),
        "focal": np.full((2,), 518.8579, np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), True)
    tx = make_optimizer(cfg, total_steps=10)
    key = jax.random.PRNGKey(0)
    mesh = create_mesh(model_axis=2, model_w_axis=2)

    def fresh_state():
        return TrainState.create(jax.tree.map(jnp.array, variables), tx)

    single = make_train_step(model, tx, cfg)
    st_ref, m_ref = single(fresh_state(),
                           {k: jnp.asarray(v) for k, v in batch.items()}, key)
    sharded = make_train_step(model, tx, cfg, mesh=mesh, spatial=True)
    st0 = jax.device_put(fresh_state(), replicated_sharding(mesh))
    st_sp, m_sp = sharded(st0, shard_batch_spatial(batch, mesh), key)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5, atol=1e-6)
    assert int(st_sp.step) == 1
    assert np.isfinite(float(m_sp["grad_norm"]))

    # frozen-BN gradients, tight leaf-for-leaf parity
    params, stats = variables["params"], variables["batch_stats"]
    images = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    depths = jnp.asarray(batch["depth"])

    def loss_fn(p, imgs, dps):
        *_, final = model.apply({"params": p, "batch_stats": stats}, imgs, False)
        return silog_loss(final[..., 0], dps, default_mask(dps, cfg.dataset),
                          cfg.variance_focus)

    gfn = jax.value_and_grad(loss_fn)
    l_ref, g_ref = jax.jit(gfn)(params, images, depths)
    repl, sp = replicated_sharding(mesh), spatial_sharding(mesh)
    g_sp_fn = jax.jit(gfn, in_shardings=(repl, sp, sp), out_shardings=(repl, repl))
    l_sp, g_sp = g_sp_fn(jax.device_put(params, repl),
                         jax.device_put(images, sp), jax.device_put(depths, sp))
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4 * scale)


def test_pallas_lpg_2d_spatial_sharding():
    """Pallas LPG sharded over BOTH plane-grid axes (h over model, w over
    model_w): the Shardy rule's ``(w ew)`` factor is exercised, forward and
    custom-VJP backward, against the jnp oracle (interpret mode)."""
    from bts_tpu.ops import lpg_pallas
    from bts_tpu.ops.lpg import lpg_reference

    old = lpg_pallas._INTERPRET
    lpg_pallas._INTERPRET = True
    try:
        mesh = create_mesh(model_axis=2, model_w_axis=2)  # 2 data x 2 H x 2 W
        rng = np.random.default_rng(1)
        b, h, w, k = 2, 8, 12, 8
        plane = rng.normal(size=(b, h, w, 4)).astype(np.float32)
        plane[..., 2] += 3.0  # denominators away from zero
        g = rng.normal(size=(b, h * k, w * k)).astype(np.float32)

        ref_out = lpg_reference(jnp.asarray(plane), k)
        ref_grad = jax.grad(lambda p: (lpg_reference(p, k) * g).sum())(
            jnp.asarray(plane)
        )

        sp_in = jax.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data", "model", "model_w")
        )
        repl = replicated_sharding(mesh)
        out_fn = jax.jit(
            lambda p: lpg_pallas.lpg(p, k), in_shardings=sp_in, out_shardings=sp_in
        )
        p_sh = jax.device_put(jnp.asarray(plane), sp_in)
        np.testing.assert_allclose(
            np.asarray(out_fn(p_sh)), np.asarray(ref_out), rtol=2e-5, atol=2e-5
        )

        grad_fn = jax.jit(
            jax.grad(lambda p: (lpg_pallas.lpg(p, k) * g).sum()),
            in_shardings=sp_in, out_shardings=repl,
        )
        np.testing.assert_allclose(
            np.asarray(grad_fn(p_sh)), np.asarray(ref_grad), rtol=1e-5, atol=1e-5
        )
    finally:
        lpg_pallas._INTERPRET = old


def test_fused_upconv_spatial_gradients():
    """Regression: GSPMD mis-partitions the backward of an lhs-dilated conv
    under H-sharding (encoder grads were off by O(1) relative).  The fused
    UpConv's custom_vjp differentiates the literal composition instead;
    frozen-BN grads sharded-vs-single must stay tight with fused=True."""
    from bts_tpu.ops.silog import default_mask, silog_loss

    cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                 bts_size=64, compute_dtype="float32")
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size, fused_upconv=True)
    h, w = 64, 96
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    depths = jnp.asarray(rng.uniform(0.5, 9.5, (2, h, w)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)), True)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p, imgs, dps):
        *_, final = model.apply({"params": p, "batch_stats": stats}, imgs, False)
        return silog_loss(final[..., 0], dps, default_mask(dps, cfg.dataset),
                          cfg.variance_focus)

    gfn = jax.value_and_grad(loss_fn)
    l_ref, g_ref = jax.jit(gfn)(params, images, depths)
    mesh = create_mesh(model_axis=4)
    repl, sp = replicated_sharding(mesh), spatial_sharding(mesh)
    g_sp_fn = jax.jit(gfn, in_shardings=(repl, sp, sp), out_shardings=(repl, repl))
    l_sp, g_sp = g_sp_fn(jax.device_put(params, repl),
                         jax.device_put(images, sp), jax.device_put(depths, sp))
    np.testing.assert_allclose(float(l_sp), float(l_ref), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sp)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4 * scale)


def test_grad_accum_spatial_matches_single():
    """--grad_accum_steps composed with --spatial_shards: the lax.scan over
    microbatches runs INSIDE the spatially-partitioned program (each
    microbatch's activations re-pinned over the model axis by loss_fn's
    sharding constraint).  The only untested pairing of two shipped train
    features as of round 3 — loss parity vs the single-device accumulated
    step, plus finite advancing state."""
    from bts_tpu.parallel.mesh import shard_batch_spatial
    from bts_tpu.training.optimizer import make_optimizer
    from bts_tpu.training.trainer import TrainState, make_train_step

    cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                 bts_size=64, compute_dtype="float32",
                 input_height=64, input_width=64, do_random_rotate=True,
                 degree=2.5, batch_size=4, grad_accum_steps=2,
                 spatial_shards=4)
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size)
    h, w = 64, 96
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.integers(0, 255, (4, h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(0.5, 9.5, (4, h, w)).astype(np.float32),
        "focal": np.full((4,), 518.8579, np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), True)
    tx = make_optimizer(cfg, total_steps=10)
    key = jax.random.PRNGKey(0)
    mesh = create_mesh(model_axis=4)  # 2 data x 4 model

    def fresh_state():
        return TrainState.create(jax.tree.map(jnp.array, variables), tx)

    single = make_train_step(model, tx, cfg)
    st_ref, m_ref = single(fresh_state(),
                           {k: jnp.asarray(v) for k, v in batch.items()}, key)
    sharded = make_train_step(model, tx, cfg, mesh=mesh, spatial=True)
    st0 = jax.device_put(fresh_state(), replicated_sharding(mesh))
    st_sp, m_sp = sharded(st0, shard_batch_spatial(batch, mesh), key)

    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5, atol=1e-6)
    assert int(st_sp.step) == 1
    assert np.isfinite(float(m_sp["grad_norm"]))
    # params advanced and stayed finite; tight grad parity is covered by the
    # frozen-BN checks in the non-accum spatial tests (same backward graph)
    for a, b in zip(jax.tree_util.tree_leaves(st_ref.params),
                    jax.tree_util.tree_leaves(st_sp.params)):
        assert np.isfinite(np.asarray(b)).all()


def test_spatial_train_odd_raw_height():
    """Regression: the raw pre-augmentation batch may not tile the spatial
    mesh axes (NYU's border crop is 427 px tall — odd).  shard_batch_spatial
    must fall back to batch-only sharding for such arrays and the train step
    must still run (activations are re-pinned spatially inside the step),
    matching the single-device loss."""
    from bts_tpu.parallel.mesh import batch_sharding, shard_batch_spatial
    from bts_tpu.training.optimizer import make_optimizer
    from bts_tpu.training.trainer import TrainState, make_train_step

    cfg = Config(dataset="nyu", encoder="mobilenetv2_bts", max_depth=10.0,
                 bts_size=64, compute_dtype="float32",
                 input_height=64, input_width=64, batch_size=2,
                 spatial_shards=2, spatial_shards_w=2)
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size)
    rng = np.random.default_rng(0)
    h, w = 427, 565  # NYU border-crop geometry: h odd, w odd
    batch = {
        "image": rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8),
        "depth": rng.uniform(0.5, 9.5, (2, h, w)).astype(np.float32),
        "focal": np.full((2,), 518.8579, np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), True)
    tx = make_optimizer(cfg, total_steps=10)
    key = jax.random.PRNGKey(0)

    single = make_train_step(model, tx, cfg)
    _, m_ref = single(
        TrainState.create(jax.tree.map(jnp.array, variables), tx),
        {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = create_mesh(model_axis=2, model_w_axis=2)
    sharded_batch = shard_batch_spatial(batch, mesh)
    # odd H/W cannot tile the (model, model_w) axes -> batch-only layout
    assert sharded_batch["image"].sharding.spec == batch_sharding(mesh).spec
    step = make_train_step(model, tx, cfg, mesh=mesh, spatial=True)
    st0 = jax.device_put(
        TrainState.create(jax.tree.map(jnp.array, variables), tx),
        replicated_sharding(mesh))
    st, m = step(st0, sharded_batch, key)
    np.testing.assert_allclose(float(m["loss"]), float(m_ref["loss"]),
                               rtol=1e-5, atol=1e-6)
    assert int(st.step) == 1
