"""Convert a FULL BTS torch checkpoint (encoder + decoder) into a bts_tpu
orbax checkpoint every driver can restore.

The reference lineage distributes trained models as torch ``.pth`` files
(SURVEY.md §6: the golden-parity contract is "load a released checkpoint,
reproduce the Eigen-split table").  This entry point executes the load half
of that contract offline:

    python -m bts_tpu.cli.bts_convert \
        --torch_checkpoint bts_eigen_v2.pth \
        --encoder densenet161_bts --bts_size 512 --max_depth 80 \
        --dataset kitti --checkpoint_path converted_ckpt/

    python -m bts_tpu.cli.bts_test @arguments/arguments_test_eigen.txt \
        --checkpoint_path converted_ckpt/

The output uses the weights-only checkpoint layout (step/params/
batch_stats — the same one per-metric best checkpoints use), which
``CheckpointManager.restore`` merges into a fresh TrainState, and a
``config.json`` geometry sidecar recording ``encoder_pad=torch`` so every
restore-side driver adopts torch stride-2 window alignment automatically
(the weights were trained under it; see config.adopt_sidecar_geometry).

Key-layout tolerance (utils.torch_converter.split_full_state_dict): an
optional ``module.`` DataParallel wrapper, ``encoder[.base_model].`` /
``decoder.`` prefixes, and ``{'model': state_dict, ...}`` training-ckpt
wrappers are all normalized; anything else fails loudly with the first
missing key, never a silently-partial import.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from bts_tpu.config import parse_args, write_config_sidecar
from bts_tpu.models import create_model


def main(argv=None) -> int:
    cfg = parse_args(argv, mode="test")
    if not cfg.torch_checkpoint:
        print("bts_convert: --torch_checkpoint is required")
        return 2
    if not cfg.checkpoint_path:
        print("bts_convert: --checkpoint_path (output directory) is required")
        return 2
    out = os.path.abspath(cfg.checkpoint_path)

    # released torch weights imply torch stride-2 geometry, recorded for
    # every downstream driver via the sidecar
    cfg = cfg.replace(encoder_pad="torch")
    model = create_model(cfg)
    variables = jax.jit(lambda k, x: model.init(k, x, False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 192, 3))
    )

    from bts_tpu.utils.torch_converter import load_torch_full_model

    new_vars = load_torch_full_model(
        variables, cfg.encoder, cfg.bts_size, cfg.torch_checkpoint
    )
    n_leaves = len(jax.tree.leaves(new_vars))
    print(f"[bts_convert] imported {n_leaves} leaves from {cfg.torch_checkpoint}")

    from bts_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(out)
    mgr.save_host(
        0,
        {
            "step": jnp.zeros((), jnp.int32),
            "params": new_vars["params"],
            "batch_stats": new_vars["batch_stats"],
        },
    )
    mgr.wait()
    mgr.close()
    write_config_sidecar(cfg, out)
    print(f"[bts_convert] wrote weights-only checkpoint + geometry sidecar to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
