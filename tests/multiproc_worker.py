"""One process of the 2-process jax.distributed integration test.

Launched by tests/test_multiprocess.py as ``python multiproc_worker.py
<process_id> <num_processes> <port> <data_root> <out_json>`` with
``XLA_FLAGS=--xla_force_host_platform_device_count=4`` — so 2 processes x 4
virtual CPU devices form the same 8-device world the single-process test
mesh uses, but with REAL cross-process gloo collectives underneath.

This executes the multi-host branches that single-process tests can't
(SURVEY.md §2.11; round-3 verdict weak #1):

- ``parallel.mesh.maybe_init_distributed`` via the JAX_COORDINATOR_ADDRESS /
  JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars (the CLI's pod launch path),
- ``BtsDataLoader``'s per-process contiguous batch slicing (train mode),
- ``shard_batch`` / ``shard_batch_spatial``'s
  ``make_array_from_process_local_data`` global-array assembly,
- one REAL dp train step, one dp x spH step, and one ZeRO-1 step (optimizer
  state reduce-scattered ACROSS processes).

Results (losses + local-slice fingerprints) are written to ``out_json`` for
the parent to cross-check against the single-process 8-device run.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # appended late-ish; never via PYTHONPATH (axon site)
    sys.path.insert(0, REPO)

import jax

# Same platform override trick as tests/conftest.py (sitecustomize force-sets
# the axon TPU plugin; env vars alone don't switch it).
jax.config.update("jax_platforms", "cpu")
# Cross-process collectives on the CPU backend need an explicit transport.
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main() -> None:
    pid, n_proc, port, data_root, out_json = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
        sys.argv[5],
    )

    # The CLI's pod path: bts_main calls maybe_init_distributed(), which picks
    # these up BEFORE anything touches the XLA backend.
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(n_proc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    from bts_tpu.parallel.mesh import maybe_init_distributed

    assert maybe_init_distributed(), "maybe_init_distributed() returned False"
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.device_count() == 4 * n_proc, jax.devices()
    # idempotent on a second call (must NOT re-run initialize)
    assert maybe_init_distributed()

    import numpy as np

    from bts_tpu.config import Config
    from bts_tpu.data.dataloader import BtsDataLoader
    from bts_tpu.models import BtsModel
    from bts_tpu.parallel.mesh import (
        create_mesh,
        replicated_sharding,
        shard_batch,
        shard_batch_spatial,
    )
    from bts_tpu.training.optimizer import make_optimizer
    from bts_tpu.training.trainer import (
        TrainState,
        make_train_step,
        zero1_state_shardings,
    )

    n_devices = jax.device_count()
    cfg = Config(
        mode="train",
        dataset="nyu",
        encoder="mobilenetv2_bts",
        max_depth=10.0,
        bts_size=64,
        input_height=32,
        input_width=64,
        batch_size=n_devices,
        compute_dtype="float32",
        do_random_rotate=True,
        degree=2.5,
        data_path=data_root,
        gt_path=data_root,
        filenames_file=os.path.join(data_root, "split.txt"),
        dataloader_workers=1,
    )

    # The REAL loader: every process shuffles the same global order and
    # loads only its contiguous slice of each global batch.
    loader = BtsDataLoader(cfg, "train")
    assert loader.process_count == n_proc
    assert loader.process_index == pid
    assert loader.local_batch == cfg.batch_size // n_proc
    batches = loader.prefetched(num_epochs=1)
    batch = next(iter(batches))
    close = getattr(batches, "close", None)
    if close:
        close()
    assert batch["image"].shape[0] == loader.local_batch, batch["image"].shape

    import jax.numpy as jnp

    model = BtsModel(
        encoder_name=cfg.encoder, max_depth=cfg.max_depth, num_features=cfg.bts_size
    )
    tx = make_optimizer(cfg, total_steps=10)
    init_img = jnp.zeros((cfg.batch_size, cfg.input_height, cfg.input_width, 3))
    variables = jax.jit(lambda k, x: model.init(k, x, True))(
        jax.random.PRNGKey(cfg.seed), init_img
    )

    results = {
        "process_id": pid,
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_batch": int(loader.local_batch),
        # fingerprint of THIS process's local slice (parent checks the two
        # processes saw different, correctly-ordered halves)
        "image_sum": float(np.asarray(batch["image"], np.float64).sum()),
        "depth_sum": float(np.asarray(batch["depth"], np.float64).sum()),
    }

    def fresh_state(m, shardings=None):
        st = TrainState.create(jax.tree.map(jnp.array, variables), tx)
        return jax.device_put(
            st, shardings if shardings is not None else replicated_sharding(m)
        )

    key = jax.random.PRNGKey(cfg.seed)

    def barrier(name: str) -> None:
        """Align the two workers before each first-use-of-a-communicator.

        Gloo context init polls the coordinator KV store with a HARD 30 s
        deadline (not configurable through jax); on a loaded 1-core box the
        per-process jit compiles preceding a collective can skew the ranks
        past it (observed flake: DEADLINE_EXCEEDED on cpu:gloo/0,2048/1).
        The coordination-service barrier has its own generous timeout, so
        syncing here shrinks the skew window to ~0 without touching library
        code."""
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(name, 600_000)

    def run_stage(name, step, st, sharded_batch):
        """Compile locally, BARRIER, then execute.

        The jit compile (the slow, cache-asymmetric part) runs before the
        barrier, so when the collective fires both ranks enter gloo context
        init within milliseconds of each other — inside its hard deadline
        regardless of box load."""
        compiled = step.lower(st, sharded_batch, key).compile()
        barrier(name)
        return compiled(st, sharded_batch, key)

    barrier("post_init")  # model init compile done; next op is a collective

    # 1) plain DP over 8 devices spanning 2 processes
    mesh = create_mesh()
    step = make_train_step(model, tx, cfg, mesh=mesh, augment=True)
    state, metrics = run_stage("dp", step, fresh_state(mesh), shard_batch(batch, mesh))
    results["loss_dp"] = float(metrics["loss"])
    results["grad_norm_dp"] = float(metrics["grad_norm"])
    assert int(state.step) == 1

    # 2) dp x spH: 4-way data x 2-way height sharding; the NYU pre-augment
    # crop is 427 px tall (not divisible), so shard_batch_spatial takes its
    # documented batch-only fallback for the raw input and the train step
    # re-pins the post-augment activations spatially — across processes.
    mesh_sp = create_mesh(model_axis=2)
    step_sp = make_train_step(model, tx, cfg, mesh=mesh_sp, augment=True, spatial=True)
    state_sp, m_sp = run_stage(
        "sp", step_sp, fresh_state(mesh_sp), shard_batch_spatial(batch, mesh_sp)
    )
    results["loss_sp"] = float(m_sp["loss"])
    assert int(state_sp.step) == 1

    # 3) ZeRO-1: optimizer m/v sharded over the data axis — the grads are
    # reduce-scattered and the applied params all-gathered ACROSS processes.
    st0 = TrainState.create(jax.tree.map(jnp.array, variables), tx)
    zsh = zero1_state_shardings(mesh, st0)
    step_z = make_train_step(model, tx, cfg, mesh=mesh, augment=True, state_shardings=zsh)
    state_z, m_z = run_stage("zero1", step_z, jax.device_put(st0, zsh), shard_batch(batch, mesh))
    results["loss_zero1"] = float(m_z["loss"])
    n_sharded = sum(
        1
        for l in jax.tree.leaves(state_z.opt_state)
        if hasattr(l, "sharding") and not l.sharding.is_fully_replicated
    )
    assert n_sharded > 0, "ZeRO-1 produced no sharded optimizer-state leaves"
    results["zero1_sharded_leaves"] = n_sharded

    # 4) preemption-guard multi-host agreement (utils/preemption.py): only
    # rank 1 observes the "signal"; off the sync cadence NO rank stops (each
    # returns locally, no collective), and at the cadence step the global OR
    # makes EVERY rank stop — the property that keeps a preempted pod from
    # hanging its next collective on a half-broken loop.
    import signal as _signal

    from bts_tpu.utils.preemption import PreemptionGuard

    guard = PreemptionGuard(signals=(_signal.SIGUSR1,), sync_freq=5)
    try:
        if pid == 1:
            os.kill(os.getpid(), _signal.SIGUSR1)
        barrier("preempt")
        assert guard.should_stop(7) is False, "off-cadence step must not stop"
        agreed = guard.should_stop(10)  # cadence step: allgathered OR
        assert agreed, f"rank {pid} missed the preemption agreement"
        results["preempt_agreed"] = bool(agreed)
    finally:
        guard.uninstall()

    for v in (results["loss_dp"], results["loss_sp"], results["loss_zero1"]):
        assert np.isfinite(v), results

    with open(out_json, "w") as f:
        json.dump(results, f)
    print(f"[worker {pid}] OK {results}", flush=True)


if __name__ == "__main__":
    main()
