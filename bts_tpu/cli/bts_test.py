"""Batch-inference driver (reference ``bts_test.py``, SURVEY.md §2.2/§3.2).

Restores a checkpoint, forwards the test split, writes uint16 depth PNGs
(KITTI x256 / NYU x1000) into ``--out_path`` (default
``result_<model_name>``), plus optional colormapped previews
(``--save_cmap``) and per-scale LPG outputs (``--save_lpg``), mirroring the
reference's raw/cmap/lpg output tree.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from bts_tpu.config import parse_args
from bts_tpu.data.augment import eval_preprocess
from bts_tpu.data.dataloader import BtsDataLoader
from bts_tpu.data.depth_io import write_depth_png
from bts_tpu.models import create_model
from bts_tpu.training.optimizer import make_optimizer
from bts_tpu.training.trainer import TrainState
from bts_tpu.utils.checkpoint import CheckpointManager


def pred_name(image_path: str, data_path: str) -> str:
    """Collision-free prediction filename: the data_path-relative image path
    flattened with '_' (KITTI basenames repeat across drives)."""
    rel = os.path.relpath(image_path, data_path) if data_path else image_path
    rel = os.path.splitext(rel)[0]
    return rel.replace(os.sep, "_").replace("/", "_").lstrip("._")


def save_cmap_png(path: str, depth: np.ndarray, max_depth: float) -> None:
    """Colormapped preview (reference bts_test.py uses a matplotlib cmap on
    normalized depth); falls back to grayscale without matplotlib."""
    norm = np.clip(depth / max_depth, 0.0, 1.0)
    try:
        from matplotlib import colormaps

        rgba = colormaps["magma"](norm)
        img = (rgba[..., :3] * 255).astype(np.uint8)
    except Exception:
        img = (norm * 255).astype(np.uint8)
    Image.fromarray(img).save(path)


def restore_state(cfg, model, sample_image):
    # jit the init at small spatial dims (params are H/W-independent); an
    # eager full-res init is minutes of op-by-op dispatch on a TPU tunnel
    b = sample_image.shape[0]
    small = jnp.zeros((b, 96, 192, 3), sample_image.dtype)
    variables = jax.jit(lambda k, x: model.init(k, x, False))(jax.random.PRNGKey(0), small)
    tx = make_optimizer(cfg, 1)
    state = TrainState.create(variables, tx)
    if cfg.checkpoint_path:
        mgr = CheckpointManager(cfg.checkpoint_path)
        state = mgr.restore(state)
        print(f"[bts_tpu] restored {cfg.checkpoint_path} @ step {int(state.step)}")
    else:
        print("[bts_tpu] WARNING: no --checkpoint_path, using random init")
    return state


def main(argv=None):
    cfg = parse_args(argv, mode="test")
    from bts_tpu.config import adopt_sidecar_geometry, warn_b4_anomaly

    cfg = adopt_sidecar_geometry(cfg)  # trained-run stride-2 geometry, if recorded
    warn_b4_anomaly(cfg)
    model = create_model(cfg)
    loader = BtsDataLoader(cfg, "test")
    out_dir = cfg.out_path or f"result_{cfg.model_name}"
    os.makedirs(os.path.join(out_dir, "raw"), exist_ok=True)
    if cfg.save_cmap:
        os.makedirs(os.path.join(out_dir, "cmap"), exist_ok=True)
    if cfg.save_lpg:
        for k in ("8x8", "4x4", "2x2"):
            os.makedirs(os.path.join(out_dir, f"lpg_{k}"), exist_ok=True)

    use_focal = cfg.dataset == "kitti"

    def _forward(params, batch_stats, images, focal):
        variables = {"params": params, "batch_stats": batch_stats}
        return model.apply(
            variables, eval_preprocess(images), False,
            focal=focal if use_focal else None,
        )

    if cfg.spatial_shards > 1 or cfg.spatial_shards_w > 1:
        # --spatial_shards N [--spatial_shards_w M]: image height (and
        # optionally width: 2-D decomposition) sharded over N*M chips (GSPMD
        # halo exchange through the conv pyramid) — full-resolution inference
        # beyond one chip's HBM, straight from the CLI (no reference analog).
        # The mesh spans ALL visible devices (like bts_main): H/W over the
        # ``model``/``model_w`` axes, batch over the remaining ``data`` axis,
        # so dp x sp compose and no chip idles when devices > shards.
        from bts_tpu.parallel.mesh import (
            create_mesh,
            replicated_sharding,
            spatial_sharding,
        )

        n_sp = cfg.spatial_shards * cfg.spatial_shards_w
        n_dev = len(jax.devices()) if cfg.num_devices <= 0 else cfg.num_devices
        n_data = max(1, n_dev // n_sp)
        if cfg.batch_size % n_data != 0:
            # batch must divide over the data axis; shrink it (batch-1 default
            # => pure spatial over the shard devices, like round 2)
            n_data = 1
        mesh = create_mesh(
            num_devices=n_data * n_sp,
            model_axis=cfg.spatial_shards,
            model_w_axis=cfg.spatial_shards_w,
        )
        repl, sp = replicated_sharding(mesh), spatial_sharding(mesh)
        forward = jax.jit(
            _forward, in_shardings=(repl, repl, sp, repl), out_shardings=sp
        )
        print(
            f"[bts_tpu] spatial inference: H over {cfg.spatial_shards} x "
            f"W over {cfg.spatial_shards_w} devices, "
            f"batch over {mesh.shape['data']}"
        )
    else:
        forward = jax.jit(_forward)

    n_total = len(loader)

    def write_outputs(start, outs):
        """Host-side conversion + PNG writes for one completed batched
        forward; pad samples in the tail batch (loader repeats the last
        sample to keep the jit shape static) are skipped."""
        final = np.asarray(outs[4])
        # device->host conversion once per batch, not once per sample
        # (jax.Array.__array__ copies the full tensor on every call)
        lpgs = (
            [("8x8", np.asarray(outs[0])), ("4x4", np.asarray(outs[1])), ("2x2", np.asarray(outs[2]))]
            if cfg.save_lpg
            else []
        )
        for j in range(final.shape[0]):
            i = start + j
            if i >= n_total:
                break
            pred = final[j, :, :, 0]
            name = pred_name(loader.samples[i].image_path, cfg.data_path)
            write_depth_png(os.path.join(out_dir, "raw", name + ".png"), pred, cfg.dataset)
            if cfg.save_cmap:
                save_cmap_png(os.path.join(out_dir, "cmap", name + ".png"), pred, cfg.max_depth)
            for k, d in lpgs:
                lpg = d[j, :, :, 0] * cfg.max_depth
                write_depth_png(os.path.join(out_dir, f"lpg_{k}", name + ".png"), lpg, cfg.dataset)
            if (i + 1) % 50 == 0:
                print(f"[bts_tpu] {i + 1}/{n_total}", flush=True)
        return min(start + final.shape[0], n_total)

    # one-deep software pipeline: dispatch the next batched forward (async)
    # before converting/writing the PNGs of the previous one, so the device
    # computes while the host encodes
    state, pending, start = None, None, 0
    for batch in loader.prefetched(num_epochs=1):
        images = jnp.asarray(batch["image"])
        if state is None:
            state = restore_state(cfg, model, eval_preprocess(images))
        outs = forward(state.params, state.batch_stats, images, jnp.asarray(batch["focal"]))
        if pending is not None:
            start = write_outputs(*pending)
        pending = (start, outs)
    if pending is not None:
        start = write_outputs(*pending)
    print(f"[bts_tpu] wrote {start} predictions to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
