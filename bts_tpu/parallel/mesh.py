"""Device mesh + sharding helpers (the tf.distribute replacement).

Reference counterpart: SURVEY.md §2.11 — the reference's only parallelism is
data-parallel via ``tf.distribute`` MirroredStrategy (GPU/NCCL) or
TPUStrategy (ICI cross-replica-sum).  TPU-native redesign: a 1-D
``jax.sharding.Mesh`` over the ``data`` axis; the train step is ``jax.jit``
with NamedShardings (params replicated, batch sharded), so XLA emits the
gradient ``psum`` over ICI itself — there is no hand-written communication
layer to maintain.

The mesh is built hierarchically when multiple slices are visible
(``jax.devices()`` spanning hosts): JAX orders devices so that the data axis
rides ICI within a slice and DCN across, which is exactly the layout the
scaling playbook prescribes for pure DP.

A second, currently-size-1 ``model`` axis is threaded through so wider
parallelism (spatial/tensor sharding of the conv pyramid) can be enabled
without changing call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed for multi-host (multi-slice) runs.

    TPU pods launch one process per host; JAX's coordinator discovers the
    fleet from the TPU runtime, or from JAX_COORDINATOR_ADDRESS (read by
    jax itself) plus JAX_NUM_PROCESSES/JAX_PROCESS_ID (read here — jax 0.9
    has no env fallback for those two outside SLURM/OMPI clusters).  Safe
    no-op on single-host. After this, jax.devices() spans all hosts and the
    data axis of :func:`create_mesh` rides ICI within a slice and DCN
    across slices (device order is ICI-major).

    MUST run before anything touches the XLA backend: even
    ``jax.process_count()`` initializes the client, after which
    ``jax.distributed.initialize`` refuses to run (verified on jax 0.9) —
    so the already-initialized check goes through ``jax.distributed``'s own
    state, never through a backend query.
    """
    import os

    if jax.distributed.is_initialized():
        return True
    if "JAX_COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        kwargs = {}
        n, pid = os.environ.get("JAX_NUM_PROCESSES"), os.environ.get("JAX_PROCESS_ID")
        if n is not None and pid is not None:
            kwargs = dict(num_processes=int(n), process_id=int(pid))
        timeout = os.environ.get("BTS_DIST_INIT_TIMEOUT")
        if timeout is not None:
            kwargs["initialization_timeout"] = int(timeout)
        try:
            jax.distributed.initialize(**kwargs)
            return True
        except Exception as e:
            # FATAL, not a fallback: the coordinator env vars say this run is
            # part of a pod. Degrading to single-host here would leave every
            # host training independently on the FULL dataset, all writing the
            # same logdir — silent corruption, the worst failure mode
            # (SURVEY.md §2.11 distribution contract).
            raise RuntimeError(
                "[bts_tpu] a distributed coordinator is configured "
                "(JAX_COORDINATOR_ADDRESS/MEGASCALE_COORDINATOR_ADDRESS) but "
                f"jax.distributed.initialize failed: {e}\nRefusing to fall "
                "back to a single-host run — every pod host would otherwise "
                "train independently on the full dataset into the same logdir."
            ) from e
    return False


def create_mesh(
    num_devices: int = -1,
    model_axis: int = 1,
    devices: Optional[Sequence] = None,
    model_w_axis: int = 1,
) -> Mesh:
    """Mesh over the visible devices: (data[, model[, model_w]]).

    ``model_axis`` shards image HEIGHT (``--spatial_shards``) and
    ``model_w_axis`` image WIDTH (``--spatial_shards_w``); together they form
    a 2-D spatial decomposition of one sample's activations (halo volume per
    device shrinks vs a 1-D H split at the same total shard count).  The
    3-axis mesh is only built when W-sharding is requested, so every
    existing (data, model) call site and compiled program is unchanged.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    n = len(devs)
    sp = model_axis * model_w_axis
    assert n % sp == 0, (
        f"{n} devices not divisible by model axes {model_axis}x{model_w_axis}"
    )
    if model_w_axis > 1:
        arr = np.asarray(devs).reshape(n // sp, model_axis, model_w_axis)
        return Mesh(arr, ("data", "model", "model_w"))
    arr = np.asarray(devs).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def zero1_sharding(mesh: Mesh, tree):
    """ZeRO-1 layout for the optimizer state (``--shard_opt_state``).

    Each array leaf is sharded over the ``data`` axis on its largest
    divisible dimension; scalars and undividable leaves stay replicated.
    Params remain replicated f32 masters — annotating only the AdamW m/v
    this way makes XLA materialize each chip's 1/N slice of the optimizer
    state, reduce-scatter the gradients into the (sharded) update, and
    all-gather the applied params: ZeRO-1 from sharding annotations alone,
    no hand-written collective (SURVEY.md §2.11 redesign; the reference's
    MirroredStrategy replicates optimizer slots on every replica).
    """
    n = mesh.shape["data"]

    def pick(leaf):
        shape = tuple(getattr(leaf, "shape", ()) or ())
        if n > 1:
            divisible = [i for i, s in enumerate(shape) if s % n == 0 and s >= n]
            if divisible:
                ax = max(divisible, key=lambda i: shape[i])
                spec = [None] * len(shape)
                spec[ax] = "data"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(pick, tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put a host batch with its leading axis sharded over ``data``.

    Multi-host: the loader yields each process's LOCAL slice of the global
    batch (BtsDataLoader shards samples by process_index); the global array
    is assembled from per-process shards without any cross-host transfer.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    import numpy as np

    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H[, W], ...) sharded batch-over-data, height-over-model, and —
    when the mesh carries a ``model_w`` axis — width-over-model_w.

    Spatial partitioning (a new capability over the reference, whose only
    axis is DP): GSPMD partitions the conv pyramid over the image height
    (and optionally width: 2-D decomposition), inserting the halo exchanges
    itself — full-resolution inference scales past one chip's HBM without
    any manual communication code.
    """
    if "model_w" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "model", "model_w"))
    return NamedSharding(mesh, P("data", "model"))


def shard_batch_spatial(batch: dict, mesh: Mesh) -> dict:
    """Batch over ``data``; image/depth height additionally over ``model``.

    Multi-host: like :func:`shard_batch`, each host holds only its local
    slice of the global batch, so the global arrays are assembled with
    ``make_array_from_process_local_data`` (a plain device_put would try to
    address other hosts' devices and raise).  The ``model`` axis must be
    host-local (create_mesh lays axes out devices-major), so a host's slice
    spans the full image height.

    Raw batches whose H (or W) does not divide the spatial axis — e.g. the
    pre-augmentation NYU border crop is 427 px tall — fall back to
    batch-only sharding for that array: the train step re-pins the
    post-augmentation activations spatially via with_sharding_constraint,
    so only the (small, uint8) input transfer is replicated across the
    spatial group, never the conv pyramid.
    """
    spatial = spatial_sharding(mesh)
    data = batch_sharding(mesh)
    n_h = mesh.shape.get("model", 1)
    n_w = mesh.shape.get("model_w", 1)

    def put(v, sh):
        if jax.process_count() == 1:
            return jax.device_put(v, sh)
        import numpy as np

        return jax.make_array_from_process_local_data(sh, np.asarray(v))

    def pick(v):
        if getattr(v, "ndim", 0) < 3:
            return data
        h_ok = v.shape[1] % n_h == 0
        w_ok = n_w == 1 or (v.ndim >= 3 and v.shape[2] % n_w == 0)
        return spatial if (h_ok and w_ok) else data

    return {k: put(v, pick(v)) for k, v in batch.items()}
