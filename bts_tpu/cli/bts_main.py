"""Training driver (reference ``bts_main.py``, SURVEY.md §2.1/§3.1).

Usage (reference-compatible):
    python -m bts_tpu.cli.bts_main @arguments/arguments_train_eigen.txt
    python -m bts_tpu.cli.bts_main arguments/arguments_train_nyu.txt
    python -m bts_tpu.cli.bts_main --dataset nyu --data_path ... [flags]

Pipeline: args -> mesh (data-parallel over all chips) -> loader ->
model/optimizer -> jitted train step (fused augmentation + fwd + bwd +
update) -> periodic TensorBoard scalars/images, orbax checkpoints, and
online eval with the 9-metric suite.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bts_tpu.config import Config, parse_args
from bts_tpu.data.dataloader import BtsDataLoader
from bts_tpu.evaluation.metrics import METRIC_NAMES, compute_errors
from bts_tpu.models import create_model
from bts_tpu.parallel.mesh import create_mesh, shard_batch
from bts_tpu.training.trainer import Trainer, make_debug_step, make_eval_step
from bts_tpu.utils.checkpoint import CheckpointManager, restore_for_retrain
from bts_tpu.utils.summary import SummaryWriter


def online_eval(eval_step, state, cfg: Config, max_samples: int = 0):
    """Reference ``online_eval()``: forward the eval split, 9 metrics."""
    if not cfg.filenames_file_eval:
        print("[bts_tpu] --do_online_eval needs --filenames_file_eval; skipping")
        return None
    loader = BtsDataLoader(cfg, "online_eval")
    from bts_tpu.data.crops import eigen_crop_mask, garg_crop_mask

    accum = []
    for i, batch in enumerate(loader.prefetched(num_epochs=1)):
        if max_samples and i >= max_samples:
            break
        pred = np.asarray(
            eval_step(
                state.params,
                state.batch_stats,
                jnp.asarray(batch["image"]),
                jnp.asarray(batch["focal"]),
            )
        )[0]
        gt = batch["depth"][0]
        pred = np.clip(pred, cfg.min_depth_eval, cfg.max_depth_eval)
        valid = gt > cfg.min_depth_eval
        valid &= gt < cfg.max_depth_eval
        h, w = gt.shape
        if cfg.garg_crop:
            valid &= garg_crop_mask(h, w)
        elif cfg.eigen_crop:
            valid &= eigen_crop_mask(h, w, cfg.dataset)
        if valid.sum() == 0:
            continue
        accum.append(compute_errors(gt[valid], pred[valid]))
    return np.mean(np.stack(accum), axis=0) if accum else None


def main(argv=None):
    cfg = parse_args(argv, mode="train")
    print(f"[bts_tpu] devices: {jax.devices()}")
    mesh = create_mesh(cfg.num_devices)
    n_data = mesh.shape["data"]
    if cfg.batch_size % n_data != 0:
        raise SystemExit(f"batch_size {cfg.batch_size} not divisible by {n_data} devices")

    loader = BtsDataLoader(cfg, "train")
    steps_per_epoch = loader.steps_per_epoch()
    total_steps = steps_per_epoch * cfg.num_epochs
    print(f"[bts_tpu] {len(loader)} samples, {steps_per_epoch} steps/epoch, {total_steps} total")

    model = create_model(cfg)
    trainer = Trainer(model, cfg, total_steps, mesh=mesh, augment=True)
    eval_step = make_eval_step(model, cfg)

    first = next(iter(loader.batches(num_epochs=1)))
    state = trainer.init_state(first)

    logdir = os.path.join(cfg.log_directory or "runs", cfg.model_name)
    ckpt_dir = cfg.checkpoint_path or os.path.join(logdir, "ckpt")
    mgr = CheckpointManager(ckpt_dir)
    if mgr.latest_step() is not None:
        if cfg.retrain:
            state = restore_for_retrain(mgr, state)
            print(f"[bts_tpu] retrain from {ckpt_dir} (step reset)")
        else:
            state = mgr.restore(state)
            print(f"[bts_tpu] resumed from {ckpt_dir} @ step {int(state.step)}")

    writer = SummaryWriter(logdir)
    # reference flag: separate TB directory for eval scalars
    eval_writer = (
        SummaryWriter(os.path.join(cfg.eval_summary_directory, cfg.model_name))
        if cfg.eval_summary_directory
        else writer
    )
    t0 = time.time()
    last_t = [t0]
    last_step = [int(state.step)]

    debug_step = make_debug_step(model, cfg)
    # fixed visualization crop from the first batch (static shape for jit)
    vis_image = np.asarray(first["image"])[:1, : cfg.input_height, : cfg.input_width]

    def on_metrics(step, metrics, state=None):
        now = time.time()
        ips = (step - last_step[0]) * cfg.batch_size / max(now - last_t[0], 1e-9)
        last_t[0], last_step[0] = now, step
        writer.scalars(step, {"train/" + k: v for k, v in metrics.items()})
        writer.scalars(step, {"train/images_per_sec": ips})
        if state is not None:
            # reference parity: TensorBoard depth + per-scale LPG images
            outs = debug_step(state.params, state.batch_stats, jnp.asarray(vis_image))
            for tag, img in outs.items():
                writer.depth_image(step, f"train/{tag}", np.asarray(img)[0], cfg.max_depth)
        print(
            f"step {step}/{total_steps} loss {float(metrics['loss']):.4f} "
            f"| {ips:.1f} img/s | elapsed {now - t0:.0f}s",
            flush=True,
        )

    def on_save(step, st):
        mgr.save(step, st)
        if cfg.do_online_eval and step % cfg.eval_freq == 0:
            results = online_eval(eval_step, st, cfg)
            if results is not None:
                eval_writer.scalars(step, dict(zip(("eval/" + n for n in METRIC_NAMES), results)))
                print("eval: " + " ".join(f"{n}={v:.4f}" for n, v in zip(METRIC_NAMES, results)))

    remaining = total_steps - int(state.step)
    state = trainer.run(
        state,
        loader.prefetched(),
        remaining,
        on_metrics,
        on_save,
        profile_dir=os.path.join(logdir, "profile") if cfg.profile else None,
    )
    mgr.save(int(state.step), state)
    mgr.wait()
    if eval_writer is not writer:
        eval_writer.close()
    writer.close()
    print(f"[bts_tpu] done at step {int(state.step)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
