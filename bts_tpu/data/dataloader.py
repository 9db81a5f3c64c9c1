"""Host-side data loading: filenames files -> decoded, geometry-fixed batches.

Reference counterpart: ``bts_dataloader.py`` (SURVEY.md §2.10).  The
reference builds a tf.data pipeline; here the host side is deliberately
thin — decode + fixed-geometry crops only — because the stochastic
augmentations run fused on device (bts_tpu.data.augment).  Split files use
the reference format: one sample per line,

    <image_path> <depth_path> [<focal>]

paths relative to ``data_path`` / ``gt_path`` (absolute paths also work).
A missing depth is spelled ``None`` in test-mode files (reference
convention for split lines without gt).

Modes mirror the reference: 'train' (shuffle, repeat, augment-ready
uint8 batches), 'online_eval' (no shuffle, full-res eval geometry),
'test' (images only).

The loader double-buffers batches with a background thread so PNG decode
overlaps device compute (the host has few cores; decode is the bottleneck
the reference hides behind tf.data prefetch).
"""

from __future__ import annotations

import os
import queue
import threading
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from bts_tpu.data.crops import kb_crop, nyu_border_crop
from bts_tpu.data.depth_io import depth_from_png


@dataclass
class Sample:
    image_path: str
    depth_path: Optional[str]
    focal: float


def parse_filenames_file(path: str, data_path: str = "", gt_path: str = "", use_right: bool = False) -> List[Sample]:
    """Parse a reference-format split file into Samples.

    KITTI eigen lines look like
    ``2011_.../image_02/data/0000000069.png 2011_.../proj_depth/groundtruth/image_02/0000000069.png 721.5377``;
    ``use_right`` swaps image_02 -> image_03 (right camera).  The training
    loader implements the reference's ``--use_right`` semantics (random
    per-sample camera choice) by parsing both variants and picking one per
    sample per epoch under the loader RNG — see BtsDataLoader._epoch_order.

    One extension beyond the reference format: a line whose FIRST CHARACTER
    (column 0) is ``#`` is skipped — the in-repo stub split files
    (train_test_inputs/, see its README) carry a provenance banner.  No
    reference split line can start with ``#`` (they start with a relative
    image path), and indented/mid-line ``#`` is NOT treated as a comment, so
    reference files parse unmodified.
    """
    samples = []
    with open(path) as f:
        for line in f:
            if line.startswith("#"):
                continue
            parts = line.split()
            if not parts:
                continue
            img = parts[0]
            depth = parts[1] if len(parts) > 1 and parts[1] != "None" else None
            focal = float(parts[2]) if len(parts) > 2 else 0.0
            if use_right:
                img = img.replace("image_02", "image_03")
                if depth:
                    depth = depth.replace("image_02", "image_03")
            samples.append(
                Sample(
                    image_path=os.path.join(data_path, img) if data_path else img,
                    depth_path=(os.path.join(gt_path, depth) if gt_path else depth) if depth else None,
                    focal=focal,
                )
            )
    return samples


def apply_fixed_geometry(
    image: np.ndarray,
    depth: Optional[np.ndarray],
    dataset: str,
    do_kb_crop: bool,
    border_crop: bool,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """The fixed-geometry crops shared by the PNG-tree and record paths.

    ``border_crop`` (NYU) is TRAIN-ONLY in the reference: test/eval forward
    the full 480x640 frame (divisible by 32 for the encoder pyramid) and the
    eigen crop is applied as a *metric mask*, never as an input crop.
    """
    if dataset == "nyu":
        if border_crop:
            image = nyu_border_crop(image)
            if depth is not None:
                depth = nyu_border_crop(depth)
    elif do_kb_crop:
        image = kb_crop(image)
        if depth is not None:
            depth = kb_crop(depth)
    return image, depth


def load_sample(
    sample: Sample,
    dataset: str,
    do_kb_crop: bool,
    need_depth: bool = True,
    border_crop: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray], float]:
    """Decode one sample and apply the fixed-geometry crops.

    Returns (uint8 HWC image, float32 HW depth-in-meters or None, focal).
    """
    image = np.asarray(Image.open(sample.image_path).convert("RGB"), dtype=np.uint8)
    depth = None
    if need_depth and sample.depth_path is not None:
        depth = depth_from_png(np.array(Image.open(sample.depth_path)), dataset)
    image, depth = apply_fixed_geometry(image, depth, dataset, do_kb_crop, border_crop)
    return image, depth, sample.focal


class BtsDataLoader:
    """Batch iterator over a split file (reference ``BtsDataloader``).

    Yields dict batches of host numpy arrays:
        image: (B, H, W, 3) uint8
        depth: (B, H, W) float32 meters  (absent in test mode)
        focal: (B,) float32
    Shapes are static per-mode; callers hand batches to
    ``bts_tpu.data.augment.augment_batch`` (train) or ``eval_preprocess``.
    """

    def __init__(self, cfg, mode: str):
        self.cfg = cfg
        self.mode = mode
        if mode == "online_eval":
            fn, dp, gp = cfg.filenames_file_eval, cfg.data_path_eval, cfg.gt_path_eval
        else:
            fn, dp, gp = cfg.filenames_file, cfg.data_path, cfg.gt_path
        # Pod-scale input (SURVEY.md §2.10 [L]): --filenames_file may name
        # ArrayRecord shards (path or glob) instead of a PNG-tree split file;
        # records are read by index, so shuffle/shard/resume logic is shared.
        from bts_tpu.data.records import looks_like_records

        self.record_source = None
        self.use_right = bool(cfg.use_right) and mode == "train"
        if fn and looks_like_records(fn):
            if mode != "train":
                raise ValueError(
                    "ArrayRecord input is a training path; test/eval drivers "
                    "need per-sample file paths (prediction naming, gt lookup) "
                    "— point them at a PNG-tree split file"
                )
            if self.use_right:
                raise ValueError(
                    "--use_right needs the PNG-tree loader: records bake one "
                    "camera per sample (write both views into the shards instead)"
                )
            from bts_tpu.data.records import RecordSource

            self.record_source = RecordSource(fn)
            self.samples = []
            self.n_base = len(self.record_source)
        else:
            self.samples = parse_filenames_file(fn, dp, gp)
            self.n_base = len(self.samples)
            # Reference --use_right: the right KITTI camera is chosen randomly
            # per sample at train time (SURVEY.md §2.10), not swapped globally.
            # Both variants live in one table (left: [0, n), right: [n, 2n)) so
            # the fixed-path native loader supports the random choice too.
            if self.use_right:
                self.samples = self.samples + parse_filenames_file(fn, dp, gp, use_right=True)
        # train/test batch by --batch_size (the test driver pipelines batched
        # forwards and ignores pad samples); online_eval stays batch-1 (its
        # per-sample gt geometry varies and metrics are per-image anyway)
        self.batch_size = cfg.batch_size if mode != "online_eval" else 1
        if mode == "train" and self.n_base < self.batch_size:
            # train epochs drop the remainder -> a split smaller than one
            # batch would yield ZERO batches (and steps_per_epoch() would
            # disagree); fail fast instead of busy-spinning an empty stream
            raise ValueError(
                f"{self.n_base} train samples < batch_size {self.batch_size}: "
                "every epoch would be empty (train mode drops the remainder)"
            )
        # multi-host DP: every host shuffles with the same seed (identical
        # global order) and loads only its contiguous slice of each global
        # batch; parallel.mesh.shard_batch reassembles the global array
        self.process_index, self.process_count = 0, 1
        if mode == "train":
            try:
                import jax

                self.process_index = jax.process_index()
                self.process_count = jax.process_count()
            except Exception:
                pass
            if self.batch_size % self.process_count != 0:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by "
                    f"{self.process_count} hosts"
                )
            self.local_batch = self.batch_size // self.process_count
        else:
            self.local_batch = self.batch_size

    def __len__(self):
        return self.n_base

    def steps_per_epoch(self) -> int:
        return max(1, self.n_base // self.batch_size)

    def _load(self, sample: Sample):
        need_depth = self.mode != "test"
        img, depth, focal = load_sample(
            sample,
            self.cfg.dataset,
            self.cfg.do_kb_crop,
            need_depth,
            border_crop=self.mode == "train",
        )
        if depth is None and need_depth:
            depth = np.zeros(img.shape[:2], np.float32)
        return img, depth, focal

    def _load_record(self, index: int):
        """Decode record ``index`` to the same contract as :meth:`_load`."""
        img, raw_depth, focal = self.record_source.read(
            index, use_native=self.cfg.use_native_loader != "never"
        )
        depth = None
        if raw_depth is not None and self.mode != "test":
            depth = depth_from_png(raw_depth, self.cfg.dataset)
        img, depth = apply_fixed_geometry(
            img, depth, self.cfg.dataset, self.cfg.do_kb_crop, border_crop=self.mode == "train"
        )
        if depth is None and self.mode != "test":
            depth = np.zeros(img.shape[:2], np.float32)
        return img, depth, focal

    def _load_index(self, i: int):
        if self.record_source is not None:
            return self._load_record(i)
        return self._load(self.samples[i])

    def _epoch_order(self, epoch: int = 0) -> List[int]:
        """Sample order for one epoch — a PURE function of (seed, epoch).

        Statelessness is what makes mid-epoch resume sample-exact: epoch e's
        order is recomputable without replaying epochs 0..e-1, so resuming at
        global step s only needs (s // steps_per_epoch, s % steps_per_epoch)
        — both derivable from the checkpointed step counter.
        """
        idx = np.arange(self.n_base)
        if self.mode == "train":
            rng = np.random.default_rng([self.cfg.seed, epoch])
            rng.shuffle(idx)
            if self.use_right:
                # random per-sample left/right camera (reference semantics)
                idx = idx + self.n_base * rng.integers(0, 2, size=idx.shape)
        return list(idx)

    def batches(self, num_epochs: Optional[int] = None, start_step: int = 0) -> Iterator[dict]:
        """Yield batches; infinite when num_epochs is None and mode=='train'.

        ``start_step`` (train mode): resume the global-step sequence exactly
        there — same epoch order, same position within the epoch — as if the
        run had never stopped.
        """
        spe = self.steps_per_epoch()
        epoch = start_step // spe if self.mode == "train" else 0
        skip = start_step % spe if self.mode == "train" else 0
        done = 0
        # parallel PNG decode within a batch (PIL's zlib work drops the GIL);
        # the native C++ loader has its own pool, this covers the PIL/record paths
        pool = None
        if self.cfg.dataloader_workers > 1 and self.local_batch > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(self.cfg.dataloader_workers)
        try:
            while num_epochs is None or done < num_epochs:
                order = self._epoch_order(epoch)
                # train: drop the remainder; test: PAD it by repeating the
                # last sample — both keep the batch shape static for jit
                # (consumers write only the first len(self) predictions)
                rem = len(order) % self.batch_size
                if rem and self.mode == "train":
                    order = order[: len(order) - rem]
                elif rem:
                    order = order + [order[-1]] * (self.batch_size - rem)
                usable = len(order)
                for start in range(skip * self.batch_size, usable, self.batch_size):
                    chunk = order[start : start + self.batch_size]
                    if self.process_count > 1:
                        lo = self.process_index * self.local_batch
                        chunk = chunk[lo : lo + self.local_batch]
                    if pool is not None:
                        loaded = list(pool.map(self._load_index, chunk))
                    else:
                        loaded = [self._load_index(i) for i in chunk]
                    batch = {
                        "image": np.stack([x[0] for x in loaded]),
                        "focal": np.array([x[2] for x in loaded], np.float32),
                    }
                    if self.mode != "test":
                        batch["depth"] = np.stack([x[1] for x in loaded])
                    yield batch
                skip = 0
                epoch += 1
                done += 1
                if self.mode != "train":
                    break
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

    def _crop_mode(self) -> int:
        from bts_tpu.data import native_loader as nl

        if self.cfg.dataset == "nyu":
            return nl.CROP_NYU if self.mode == "train" else nl.CROP_NONE
        return nl.CROP_KB if self.cfg.do_kb_crop else nl.CROP_NONE

    def _native(self, num_epochs: Optional[int], start_step: int = 0) -> Optional[Iterator[dict]]:
        """C++ decode+prefetch fast path (native/btsdata.cc); None if unusable."""
        if self.record_source is not None:
            return None  # records are decoded via _load_record (no file paths)
        if self.cfg.use_native_loader == "never":
            return None
        from bts_tpu.data import native_loader as nl

        if not nl.available():
            if self.cfg.use_native_loader == "always":
                raise RuntimeError("--use_native_loader always but libbtsdata unavailable")
            return None
        crop_mode = self._crop_mode()
        if crop_mode == nl.CROP_NONE:
            if self.cfg.dataset == "kitti":
                # raw KITTI frames vary in size across drives; without the
                # KB-crop there is no static geometry for batch assembly
                return None
            # fixed geometry assumed across the split; probe sample 0
            probe = np.asarray(Image.open(self.samples[0].image_path))
            h, w = probe.shape[0], probe.shape[1]
        else:
            h, w = nl.crop_shape(crop_mode, 0, 0)
        inv_scale = 1.0 / (1000.0 if self.cfg.dataset == "nyu" else 256.0)
        loader = nl.NativeBatchLoader(
            [s.image_path for s in self.samples],
            [s.depth_path for s in self.samples],
            [s.focal for s in self.samples],
            batch=self.local_batch,
            height=h,
            width=w,
            crop_mode=crop_mode,
            inv_scale=inv_scale,
            with_depth=self.mode != "test",
            # reference --num_threads maps onto the native decode pool
            num_threads=max(self.cfg.dataloader_workers, self.cfg.num_threads),
        )

        def gen():
            try:
                spe = self.steps_per_epoch()
                epoch = start_step // spe if self.mode == "train" else 0
                skip = start_step % spe if self.mode == "train" else 0
                done = 0
                while num_epochs is None or done < num_epochs:
                    order = np.asarray(self._epoch_order(epoch), np.int32)
                    if self.mode == "train":
                        usable = len(order) - (len(order) % self.batch_size)
                        order = order[:usable].reshape(-1, self.batch_size)
                        if self.process_count > 1:
                            # this host's contiguous slice of each global batch
                            lo = self.process_index * self.local_batch
                            order = order[:, lo : lo + self.local_batch]
                        # mid-epoch resume: drop the batches already consumed
                        order = order[skip:].reshape(-1)
                    elif len(order) % self.batch_size:
                        # test mode: pad the tail batch (NativeBatchLoader
                        # drops non-multiples; consumers ignore pad samples)
                        pad = self.batch_size - len(order) % self.batch_size
                        order = np.concatenate([order, np.repeat(order[-1:], pad)])
                    loader.start_epoch(order)
                    yield from loader
                    skip = 0
                    epoch += 1
                    done += 1
                    if self.mode != "train":
                        break
            finally:
                loader.close()

        return gen()

    def prefetched(
        self, num_epochs: Optional[int] = None, depth: int = 2, start_step: int = 0
    ) -> Iterator[dict]:
        """Batches with decode overlapping device compute.

        Prefers the native C++ loader (decode + crop + batch assembly on
        worker threads); falls back to PIL + a Python prefetch thread.
        ``start_step`` resumes the train-mode batch sequence sample-exactly.
        """
        native = self._native(num_epochs, start_step)
        if native is not None:
            return native
        return self._py_prefetched(num_epochs, depth, start_step)

    def _py_prefetched(
        self, num_epochs: Optional[int] = None, depth: int = 2, start_step: int = 0
    ) -> Iterator[dict]:
        """Python fallback: PIL decode under a background prefetch thread.

        Closing (or abandoning) this generator stops the worker and closes
        the underlying :meth:`batches` generator, so its decode thread-pool
        is shut down even when the infinite train stream is dropped
        mid-epoch (Trainer.run returning after ``remaining`` steps) — a
        worker blocked on ``q.put`` must not pin the pool plus an in-flight
        batch for the rest of the process.
        """
        q: "queue.Queue" = queue.Queue(maxsize=depth)
        sentinel = object()
        stop = threading.Event()

        def guarded_put(item) -> bool:
            """Put unless the consumer is gone; True if the item was queued."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            # surface loader failures to the consumer: a swallowed exception
            # here would end the stream early and let a training/test run
            # report success on a fraction of the data
            gen = self.batches(num_epochs, start_step)
            try:
                for b in gen:
                    if not guarded_put(b):
                        return
                guarded_put(sentinel)
            except BaseException as e:  # noqa: BLE001 - re-raised on consumer side
                guarded_put(e)
            finally:
                gen.close()  # shuts down the decode ThreadPoolExecutor

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
