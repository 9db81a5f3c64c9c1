"""Measure the per-device optimizer-state footprint of --shard_opt_state.

ZeRO-1 (SURVEY.md §2.11 redesign; the reference's MirroredStrategy keeps a
full optimizer-slot replica per device) shards the AdamW m/v over the
``data`` mesh axis purely via NamedSharding annotations.  This script
device_puts the flagship (densenet161) TrainState on an 8-device virtual
CPU mesh under both layouts and sums the *addressable shard* bytes of the
optimizer state on one device — the actual allocation a chip would hold —
plus the replicated params/BN for context.  Conv/BN param shapes are
spatial-dim independent, so tiny init dims give the real 47M-param count.

Run: python scripts/exp_zero_mem.py [--encoder densenet161_bts]
(forces an 8-device virtual CPU mesh in-process — the sitecustomize-pinned
axon platform ignores JAX_PLATFORMS, see CLAUDE.md).
Appends nothing; prints one JSON line (recorded in PERFORMANCE.md).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from bts_tpu.config import Config
from bts_tpu.models import BtsModel
from bts_tpu.parallel.mesh import create_mesh, replicated_sharding
from bts_tpu.training.optimizer import make_optimizer
from bts_tpu.training.trainer import TrainState, zero1_state_shardings


def dev0_bytes(tree) -> int:
    """Bytes actually resident on device 0 for every leaf in ``tree``."""
    total = 0
    for leaf in jax.tree.leaves(tree):
        for s in leaf.addressable_shards:
            if s.device == jax.devices()[0]:
                total += s.data.nbytes
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="densenet161_bts")
    args = ap.parse_args()

    mesh = create_mesh()
    n = mesh.shape["data"]
    cfg = Config(dataset="kitti", encoder=args.encoder, max_depth=80.0)
    model = BtsModel(encoder_name=cfg.encoder, max_depth=cfg.max_depth,
                     num_features=cfg.bts_size)
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, 32, 64, 3)), True))(
        jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, total_steps=10)
    state = TrainState.create(variables, tx)

    repl = jax.device_put(state, replicated_sharding(mesh))
    zsh = zero1_state_shardings(mesh, state)
    zero = jax.device_put(state, zsh)

    n_params = sum(l.size for l in jax.tree.leaves(state.params))
    repl_opt = dev0_bytes(repl.opt_state)
    zero_opt = dev0_bytes(zero.opt_state)
    param_bytes = dev0_bytes(repl.params) + dev0_bytes(repl.batch_stats)
    print(json.dumps({
        "experiment": "zero1_opt_state_footprint",
        "encoder": args.encoder,
        "data_shards": n,
        "n_params_m": round(n_params / 1e6, 1),
        "params_plus_bn_gb_per_dev": round(param_bytes / 1e9, 3),
        "opt_state_replicated_gb_per_dev": round(repl_opt / 1e9, 3),
        "opt_state_zero1_gb_per_dev": round(zero_opt / 1e9, 3),
        "freed_gb_per_dev": round((repl_opt - zero_opt) / 1e9, 3),
        "freed_frac_of_opt": round(1 - zero_opt / repl_opt, 3),
    }))


if __name__ == "__main__":
    main()
