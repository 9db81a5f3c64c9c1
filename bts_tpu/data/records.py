"""ArrayRecord dataset path for pod-scale input (SURVEY.md §2.10 [L]).

The reference reads PNG trees off local disk via tf.data; at pod scale the
input layout of record (the per-file metadata round-trips of a 24k-file PNG
tree against GCS/NFS dominate the input pipeline).  The TPU-native answer is
a sharded random-access record format: ArrayRecord (grain's native format)
gives O(1) seeks by record index, which is exactly what the loader's
(seed, epoch)-pure shuffle + sample-exact resume need — epoch orders are
permutations of record indices, no iterator state to checkpoint.

Records pack the ALREADY-ENCODED image/depth bytes plus the focal length, so
a converted dataset is byte-identical to the PNG-tree pipeline downstream of
decode.  Framing (little-endian, self-describing, no proto dependency):

    uint32 img_len | image PNG/JPEG bytes
    uint32 depth_len | depth uint16-PNG bytes    (depth_len == 0: no gt)
    float32 focal

Write shards with ``scripts/make_records.py``; point ``--filenames_file`` at
a ``.array_record`` path or glob and ``BtsDataLoader`` uses this path
automatically.
"""

from __future__ import annotations

import glob
import io
import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np


def looks_like_records(path: str) -> bool:
    """True if a --filenames_file value names ArrayRecord shards (path or glob)."""
    return path.rstrip("*?[]").endswith((".array_record", ".arrayrecord"))


def encode_record(img_bytes: bytes, depth_bytes: Optional[bytes], focal: float) -> bytes:
    depth_bytes = depth_bytes or b""
    return b"".join(
        (
            struct.pack("<I", len(img_bytes)),
            img_bytes,
            struct.pack("<I", len(depth_bytes)),
            depth_bytes,
            struct.pack("<f", focal),
        )
    )


def decode_record(
    buf: bytes, use_native: bool = True
) -> Tuple[np.ndarray, Optional[np.ndarray], float]:
    """-> (uint8 HWC image, raw decoded depth PNG array or None, focal).

    The depth array is the raw PNG payload (counts; uint16 via PIL, float32
    via the native decoder — exact either way); scaling to meters (x1/256
    KITTI, x1/1000 NYU) happens in the loader like the PNG-tree path.

    ``use_native`` routes the payload decode through the C++ in-memory
    decoder (``native_loader.decode_rgb_mem``/``decode_depth_mem``) when the
    library is available (measured per-path costs: PERFORMANCE.md input
    table); PIL remains the fallback for anything the native path can't
    parse (e.g. paletted/8-bit depth PNGs).
    """
    from PIL import Image

    # validate framing before decode: a truncated/corrupt payload should
    # fail HERE with a framing message, not as a cryptic struct/PIL error
    # deep inside the prefetch thread
    if len(buf) < 4:
        raise ValueError(f"record truncated: {len(buf)} bytes (< 4-byte header)")
    (img_len,) = struct.unpack_from("<I", buf, 0)
    off = 4
    if off + img_len + 4 > len(buf):
        raise ValueError(
            f"record truncated: img_len {img_len} overruns {len(buf)}-byte payload"
        )
    native = None
    if use_native:
        from bts_tpu.data import native_loader as nl

        native = nl if nl.available() else None

    img_bytes = buf[off : off + img_len]
    image = None
    if native is not None:
        try:
            image = native.decode_rgb_mem(img_bytes)
        except Exception:
            image = None
    if image is None:
        image = np.asarray(Image.open(io.BytesIO(img_bytes)).convert("RGB"), np.uint8)
    off += img_len
    (depth_len,) = struct.unpack_from("<I", buf, off)
    off += 4
    if off + depth_len + 4 != len(buf):
        raise ValueError(
            f"record framing mismatch: expected {off + depth_len + 4} bytes "
            f"(img {img_len} + depth {depth_len} + focal), payload has {len(buf)}"
        )
    depth = None
    if depth_len:
        depth_bytes = buf[off : off + depth_len]
        if native is not None:
            try:
                depth = native.decode_depth_mem(depth_bytes)
            except Exception:
                depth = None
        if depth is None:
            depth = np.array(Image.open(io.BytesIO(depth_bytes)))
    off += depth_len
    (focal,) = struct.unpack_from("<f", buf, off)
    return image, depth, focal


def write_records(
    samples: Sequence,
    out_prefix: str,
    shard_size: int = 1024,
    options: str = "group_size:1",
) -> List[str]:
    """Pack loader Samples into ArrayRecord shards ``<prefix>-NNNNN-of-NNNNN``.

    ``group_size:1`` keeps every record independently seekable (random-access
    reads during shuffled training; the default groups trade seek for ratio).
    """
    from array_record.python.array_record_module import ArrayRecordWriter

    n_shards = max(1, (len(samples) + shard_size - 1) // shard_size)
    paths = [f"{out_prefix}-{i:05d}-of-{n_shards:05d}.array_record" for i in range(n_shards)]
    for shard_i, path in enumerate(paths):
        writer = ArrayRecordWriter(path, options)
        for s in samples[shard_i * shard_size : (shard_i + 1) * shard_size]:
            with open(s.image_path, "rb") as f:
                img_bytes = f.read()
            depth_bytes = None
            if s.depth_path is not None:
                with open(s.depth_path, "rb") as f:
                    depth_bytes = f.read()
            writer.write(encode_record(img_bytes, depth_bytes, s.focal))
        writer.close()
    return paths


class RecordSource:
    """Random-access view over ArrayRecord shards (one logical index space).

    Thin wrapper over grain's ArrayRecordDataSource: len() and __getitem__
    by global record index — the loader treats it exactly like its in-memory
    sample table, so shuffling/sharding/resume logic is shared verbatim.
    """

    def __init__(self, pattern: str):
        from array_record.python.array_record_data_source import ArrayRecordDataSource

        files = sorted(glob.glob(pattern)) if any(c in pattern for c in "*?[") else [pattern]
        if not files or not all(os.path.exists(f) for f in files):
            raise FileNotFoundError(f"no ArrayRecord shards match {pattern!r}")
        self._files = files
        self._source = ArrayRecordDataSource(files)

    def __len__(self) -> int:
        return len(self._source)

    def _locate(self, index: int) -> str:
        """Best-effort 'shard[local_index]' label for error messages."""
        try:
            from array_record.python.array_record_module import ArrayRecordReader

            remaining = index
            for f in self._files:
                reader = ArrayRecordReader(f)
                n = reader.num_records()
                reader.close()
                if remaining < n:
                    return f"{f}[{remaining}]"
                remaining -= n
        except Exception:
            pass
        return f"record {index} of {self._files}"

    def read(
        self, index: int, use_native: bool = True
    ) -> Tuple[np.ndarray, Optional[np.ndarray], float]:
        try:
            return decode_record(self._source[index], use_native=use_native)
        except Exception as e:
            # name the shard + local record so a bad shard is findable among
            # thousands without bisecting the global index space
            raise RuntimeError(f"failed to decode {self._locate(index)}: {e}") from e
