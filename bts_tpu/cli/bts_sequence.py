"""Sequence/video inference driver (reference ``bts_sequence.py``,
SURVEY.md §2.14/§3.5 and BASELINE.json config #5).

Globs a directory of frames (``--image_path``), forwards them in fixed-size
batches through one jitted program (static shapes -> one XLA compile), and
writes per-frame uint16 depth PNGs to ``--out_path``.  Preprocessing
(u8 -> normalize) is fused on-device into the forward program; frame decode
overlaps device compute via a background thread.
"""

from __future__ import annotations

import glob
import os
import sys
import threading
import queue

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from bts_tpu.config import parse_args
from bts_tpu.data.augment import eval_preprocess
from bts_tpu.data.crops import kb_crop
from bts_tpu.data.depth_io import write_depth_png
from bts_tpu.models import create_model
from bts_tpu.cli.bts_test import restore_state


def frame_batches(files, batch: int, do_kb_crop: bool, q: "queue.Queue"):
    buf, names = [], []
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.uint8)
        if do_kb_crop:
            img = kb_crop(img)
        buf.append(img)
        names.append(os.path.splitext(os.path.basename(f))[0])
        if len(buf) == batch:
            q.put((np.stack(buf), list(names)))
            buf, names = [], []
    if buf:  # pad the tail so the jitted program keeps its static shape
        pad = batch - len(buf)
        q.put((np.stack(buf + [buf[-1]] * pad), names))
    q.put(None)


def main(argv=None):
    cfg = parse_args(argv, mode="sequence")
    from bts_tpu.config import adopt_sidecar_geometry, warn_b4_anomaly

    cfg = adopt_sidecar_geometry(cfg)  # trained-run stride-2 geometry, if recorded
    warn_b4_anomaly(cfg)
    files = sorted(
        sum((glob.glob(os.path.join(cfg.image_path, p)) for p in ("*.png", "*.jpg", "*.jpeg")), [])
    )
    if not files:
        raise SystemExit(f"no frames found in {cfg.image_path}")
    out_dir = cfg.out_path or "sequence_out"
    os.makedirs(out_dir, exist_ok=True)
    model = create_model(cfg)
    batch = max(1, cfg.batch_size)

    @jax.jit
    def forward(params, batch_stats, images):
        variables = {"params": params, "batch_stats": batch_stats}
        *_, final = model.apply(variables, eval_preprocess(images), False)
        return final[..., 0]

    q: "queue.Queue" = queue.Queue(maxsize=2)
    t = threading.Thread(
        target=frame_batches, args=(files, batch, cfg.do_kb_crop, q), daemon=True
    )
    t.start()

    state, n, pending = None, 0, None

    def flush(preds_dev, names):
        nonlocal n
        preds = np.asarray(preds_dev)
        for j, name in enumerate(names):
            write_depth_png(os.path.join(out_dir, name + ".png"), preds[j], cfg.dataset)
            n += 1
        if n % 100 < batch:
            print(f"[bts_tpu] {n}/{len(files)} frames", flush=True)

    # one-deep pipeline: dispatch the next batch's forward before converting
    # and encoding the previous batch's PNGs (device/host overlap)
    while True:
        item = q.get()
        if item is None:
            break
        images, names = item
        ji = jnp.asarray(images)
        if state is None:
            state = restore_state(cfg, model, eval_preprocess(ji))
        preds_dev = forward(state.params, state.batch_stats, ji)
        if pending is not None:
            flush(*pending)
        pending = (preds_dev, names)
    if pending is not None:
        flush(*pending)
    print(f"[bts_tpu] wrote {n} depth frames to {out_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
