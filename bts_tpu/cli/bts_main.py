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
from bts_tpu.evaluation.metrics import METRIC_NAMES
from bts_tpu.models import create_model
from bts_tpu.parallel.mesh import create_mesh, shard_batch
from bts_tpu.training.trainer import Trainer, make_debug_step, make_eval_step
from bts_tpu.utils.checkpoint import CheckpointManager, restore_for_retrain
from bts_tpu.utils.summary import SummaryWriter


def online_eval(eval_step, state, cfg: Config, max_samples: int = 0):
    """Reference ``online_eval()``: forward the eval split, 9 metrics.

    Evaluates against the FULL-RESOLUTION gt (the KB-cropped prediction is
    zero-padded back onto it), so the garg/eigen crop selects the same
    pixels as bts_eval.py and the published protocol — masking the cropped
    gt directly would shift the evaluated region.

    Batched AND pipelined (the reference's online_eval is a serial batch-1
    loop): input images share a static eval geometry (KB crop / full NYU
    frame), so they are forwarded ``--batch_size`` at a time with the tail
    batch padded by repeating the last sample (static jit shape; pad
    predictions are dropped) — b1 full-res inference is the least efficient
    shape on this bandwidth-bound model (77 vs 97 img/s measured).  A
    prefetch thread decodes image+gt PNGs ahead of the device, and the
    forward for batch i+1 is dispatched asynchronously before the host
    computes metrics for batch i.  Per-sample gt stays on host at its own
    resolution — metrics are per-image and gt shapes may vary.
    """
    if not cfg.filenames_file_eval:
        print("[bts_tpu] --do_online_eval needs --filenames_file_eval; skipping")
        return None
    import queue
    import threading

    from PIL import Image

    from bts_tpu.cli.bts_eval import masked_errors, pad_pred_to_gt
    from bts_tpu.data.dataloader import load_sample, parse_filenames_file
    from bts_tpu.data.depth_io import depth_from_png

    samples = parse_filenames_file(cfg.filenames_file_eval, cfg.data_path_eval, cfg.gt_path_eval)
    if max_samples:
        samples = samples[:max_samples]
    samples = [s for s in samples if s.depth_path is not None]

    # batching requires a static input geometry; raw (un-KB-cropped) KITTI
    # frames vary in size across drives, so that path stays batch-1
    bs = max(1, cfg.batch_size)
    if cfg.dataset == "kitti" and not cfg.do_kb_crop:
        bs = 1

    q: queue.Queue = queue.Queue(maxsize=2)

    def producer():
        try:
            buf = []

            def flush(count):
                while len(buf) < bs:  # pad tail (static jit shape)
                    buf.append(buf[-1])
                q.put(
                    (
                        np.stack([x[0] for x in buf]),
                        np.array([x[1] for x in buf], np.float32),
                        [x[2] for x in buf],
                        count,
                    )
                )
                buf.clear()

            for s in samples:
                img, _, focal = load_sample(
                    s, cfg.dataset, cfg.do_kb_crop, need_depth=False, border_crop=False
                )
                gt = depth_from_png(np.array(Image.open(s.depth_path)), cfg.dataset)
                buf.append((img, focal, gt))
                if len(buf) == bs:
                    flush(bs)
            if buf:
                flush(len(buf))
        except Exception as e:  # surface loader errors on the consumer side
            q.put(e)
        q.put(None)

    threading.Thread(target=producer, daemon=True).start()

    accum = []

    def finish(pred_dev, gts, count):
        preds = np.asarray(pred_dev)  # one device->host copy per batch
        for j in range(count):
            pred, gt = preds[j], gts[j]
            if cfg.do_kb_crop:
                pred = pad_pred_to_gt(pred, gt.shape, cfg)
            errs = masked_errors(gt, pred, cfg)
            if errs is not None:
                accum.append(errs)

    pending = None
    while True:
        item = q.get()
        if item is None:
            break
        if isinstance(item, Exception):
            raise item
        imgs, focals, gts, count = item
        pred_dev = eval_step(
            state.params, state.batch_stats, jnp.asarray(imgs), jnp.asarray(focals)
        )
        if pending is not None:
            finish(*pending)
        pending = (pred_dev, gts, count)
    if pending is not None:
        finish(*pending)
    return np.mean(np.stack(accum), axis=0) if accum else None


def main(argv=None):
    cfg = parse_args(argv, mode="train")
    if cfg.debug_nans:
        # the race-detector/sanitizer analog (SURVEY.md §5): every jitted
        # program re-checks outputs and fails fast at the producing op
        jax.config.update("jax_debug_nans", True)
    from bts_tpu.parallel.mesh import maybe_init_distributed

    maybe_init_distributed()
    print(f"[bts_tpu] devices: {jax.devices()} ({jax.process_count()} hosts)")
    # --spatial_shards N [--spatial_shards_w M]: (data, model[, model_w])
    # mesh; image height (and optionally width: 2-D decomposition) is
    # sharded over the model axes so one sample's activations span N*M
    # chips' HBM (resolutions beyond a single chip; no reference counterpart)
    mesh = create_mesh(
        cfg.num_devices,
        model_axis=cfg.spatial_shards,
        model_w_axis=cfg.spatial_shards_w,
    )
    n_data = mesh.shape["data"]
    if cfg.batch_size % n_data != 0:
        raise SystemExit(f"batch_size {cfg.batch_size} not divisible by {n_data} devices")
    spatial_on = cfg.spatial_shards > 1 or cfg.spatial_shards_w > 1
    if spatial_on:
        # the post-augmentation activations are what span devices; their
        # geometry must tile the spatial mesh axes exactly
        if cfg.input_height % cfg.spatial_shards != 0:
            raise SystemExit(
                f"input_height {cfg.input_height} not divisible by "
                f"--spatial_shards {cfg.spatial_shards}"
            )
        if cfg.input_width % cfg.spatial_shards_w != 0:
            raise SystemExit(
                f"input_width {cfg.input_width} not divisible by "
                f"--spatial_shards_w {cfg.spatial_shards_w}"
            )
        print(
            f"[bts_tpu] spatial sharding: H over {cfg.spatial_shards} x "
            f"W over {cfg.spatial_shards_w} devices"
        )

    loader = BtsDataLoader(cfg, "train")
    steps_per_epoch = loader.steps_per_epoch()
    total_steps = steps_per_epoch * cfg.num_epochs
    print(f"[bts_tpu] {len(loader)} samples, {steps_per_epoch} steps/epoch, {total_steps} total")

    # resuming/fine-tuning: adopt the original run's stride-2 geometry from
    # its config sidecar (weights trained torch-aligned must stay so)
    logdir = os.path.join(cfg.log_directory or "runs", cfg.model_name)
    from bts_tpu.config import adopt_sidecar_geometry, write_config_sidecar

    cfg = adopt_sidecar_geometry(cfg, extra_dirs=(logdir,))
    model = create_model(cfg)
    trainer = Trainer(
        model, cfg, total_steps, mesh=mesh, augment=True, spatial=spatial_on
    )
    eval_step = make_eval_step(model, cfg)

    first = next(iter(loader.batches(num_epochs=1)))
    state = trainer.init_state(first)

    # snapshot the full (resolved) flag surface next to the checkpoints —
    # the reference's train driver does the same with its arguments file
    write_config_sidecar(cfg, logdir)
    # --retrain restores FROM checkpoint_path but saves into a fresh dir:
    # orbax's should_save() refuses steps <= the dir's latest, so saving the
    # reset-to-0 run back into the source dir would silently write nothing.
    save_dir = os.path.join(logdir, "ckpt")
    restore_dir = cfg.checkpoint_path or save_dir
    if cfg.retrain and os.path.abspath(restore_dir) == os.path.abspath(save_dir):
        raise SystemExit(
            "--retrain restores weights and resets the step counter; give it a "
            "--checkpoint_path different from log_directory/model_name/ckpt "
            "(orbax cannot save step-0 checkpoints over a later run)"
        )
    if cfg.retrain:
        src = CheckpointManager(restore_dir)
        if src.latest_step() is None:
            raise SystemExit(f"--retrain: no checkpoint found in {restore_dir}")
        state = restore_for_retrain(src, state)
        src.close()
        print(f"[bts_tpu] retrain from {restore_dir} (step reset)")
        # a reused logdir still holds the OLD run's checkpoints at later
        # steps; orbax silently refuses to save step <= latest, so the fresh
        # step-0 run would train without persisting anything — clear them
        # (same rationale as the best-bar reset below)
        if os.path.isdir(save_dir) and any(
            d.isdigit() for d in os.listdir(save_dir)
        ):
            import shutil

            shutil.rmtree(save_dir)
            print(f"[bts_tpu] retrain: cleared stale checkpoints in {save_dir}")
        mgr = CheckpointManager(save_dir)
    else:
        mgr = CheckpointManager(restore_dir if cfg.checkpoint_path else save_dir)
        if mgr.latest_step() is not None:
            state = mgr.restore(state)
            print(f"[bts_tpu] resumed @ step {int(state.step)}")

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

    # reference parity: the train driver tracks the best value of each of the
    # 9 eval metrics across online evals and keeps a per-metric "best"
    # checkpoint, replacing the previous one (evaluation/best.py). The JSON
    # sidecar makes the bar resume-safe.
    from bts_tpu.evaluation.best import BestCheckpoints, BestTracker

    best_tracker = BestTracker(logdir)
    best_ckpts = BestCheckpoints(os.path.join(logdir, "ckpt_best"))
    if cfg.retrain and best_tracker.best:
        # --retrain resets the step counter; the best-metric bar and the
        # per-metric best checkpoints reset with it — a reused logdir would
        # otherwise compete against the OLD run's bar while orbax silently
        # refuses to save bests at steps <= the stale managers' latest
        best_tracker.reset()
        best_ckpts.reset()
        print("[bts_tpu] retrain: reset stale best-metric bar + best checkpoints")

    def on_eval(step, st):
        if not cfg.do_online_eval:
            return
        results = online_eval(eval_step, st, cfg)
        if results is not None:
            eval_writer.scalars(step, dict(zip(("eval/" + n for n in METRIC_NAMES), results)))
            print("eval: " + " ".join(f"{n}={v:.4f}" for n, v in zip(METRIC_NAMES, results)))
            # sidecar written only AFTER the best checkpoints commit: a crash
            # in between must not leave a bar whose checkpoints don't exist
            # (strict </> on resume would then suppress re-saving them)
            improved = best_tracker.update(step, results, persist=False)
            if improved:
                best_ckpts.save(improved, step, st)
                best_tracker.persist()
                eval_writer.scalars(
                    step,
                    {
                        f"eval/best_{n}": best_tracker.best[n]["value"]
                        for n in improved
                    },
                )
                print(f"[bts_tpu] new best @ step {step}: {', '.join(improved)}")

    # SIGTERM (TPU-VM preemption / maintenance drain) => finish the in-flight
    # step, fall through to the final checkpoint below, exit 0; the scheduler
    # restarts this same command and sample-exact resume continues the data
    # stream at the saved step (utils/preemption.py)
    guard = None
    if cfg.preempt_sync_freq > 0:
        from bts_tpu.utils.preemption import PreemptionGuard

        guard = PreemptionGuard(sync_freq=cfg.preempt_sync_freq)
    remaining = total_steps - int(state.step)
    try:
        state = trainer.run(
            state,
            # sample-exact resume: the batch stream continues at the
            # checkpointed global step (same per-epoch shuffle, same cursor),
            # so a restarted run sees exactly the data an uninterrupted one
            # would have
            loader.prefetched(start_step=int(state.step)),
            remaining,
            on_metrics,
            on_save,
            on_eval,
            profile_dir=os.path.join(logdir, "profile") if cfg.profile else None,
            should_stop=guard.should_stop if guard is not None else None,
        )
    finally:
        if guard is not None:
            guard.uninstall()
    mgr.save(int(state.step), state)
    mgr.wait()
    best_ckpts.close()
    if eval_writer is not writer:
        eval_writer.close()
    writer.close()
    if guard is not None and guard.preempted:
        print(
            f"[bts_tpu] preempted: checkpoint saved at step {int(state.step)} "
            "— rerun the same command to resume"
        )
    else:
        print(f"[bts_tpu] done at step {int(state.step)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
