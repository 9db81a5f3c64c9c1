"""ctypes binding for the native C++ data plane (native/btsdata.cc).

The reference's input pipeline rides tf.data's C++ decode/prefetch ops
(SURVEY.md §2.10); bts_tpu's equivalent is libbtsdata.so: libpng/libjpeg
decode with the fixed-geometry crop fused into the row copy, plus a
thread-pool batch prefetcher.  This module lazily builds the .so with g++
on first use (cached next to the source) and exposes:

- decode_rgb / decode_depth — single-sample decode (PIL-compatible output)
- NativeBatchLoader — assembled uint8/float32 batches, decoded ahead of the
  device step by C++ worker threads

Everything degrades gracefully: ``available()`` is False when the toolchain
or libraries are missing and callers fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

CROP_NONE, CROP_KB, CROP_NYU = 0, 1, 2

_lib = None
_lib_lock = threading.Lock()
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "btsdata.cc")
_SO = os.path.join(_REPO_ROOT, "native", "libbtsdata.so")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-lpng", "-ljpeg", "-lz", "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.bts_decode_rgb.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.bts_decode_depth.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.bts_peek_dims.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.bts_decode_rgb_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.bts_decode_depth_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.bts_loader_create.restype = ctypes.c_void_p
        lib.bts_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.bts_loader_start_epoch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_int,
        ]
        lib.bts_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.bts_loader_errors.argtypes = [ctypes.c_void_p]
        lib.bts_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def crop_shape(crop_mode: int, h: int, w: int) -> Tuple[int, int]:
    if crop_mode == CROP_KB:
        return 352, 1216
    if crop_mode == CROP_NYU:
        return 472 - 45, 608 - 43
    return h, w


def decode_rgb(path: str, crop_mode: int, out_h: int, out_w: int) -> np.ndarray:
    """Decode + crop an RGB image natively -> (out_h, out_w, 3) uint8."""
    lib = _load()
    out = np.empty((out_h, out_w, 3), np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.bts_decode_rgb(
        path.encode(), crop_mode, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0 or h.value != out_h or w.value != out_w:
        raise IOError(f"native decode_rgb failed for {path} (rc={rc}, {h.value}x{w.value})")
    return out


def decode_depth(path: str, crop_mode: int, inv_scale: float, out_h: int, out_w: int) -> np.ndarray:
    """Decode + crop + scale a uint16 depth PNG natively -> (h, w) float32 m."""
    lib = _load()
    out = np.empty((out_h, out_w), np.float32)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.bts_decode_depth(
        path.encode(), crop_mode, inv_scale,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0 or h.value != out_h or w.value != out_w:
        raise IOError(f"native decode_depth failed for {path} (rc={rc}, {h.value}x{w.value})")
    return out


def _as_u8_ptr(data: bytes):
    return ctypes.cast(
        (ctypes.c_char * len(data)).from_buffer_copy(data),
        ctypes.POINTER(ctypes.c_uint8),
    )


def peek_dims(data: bytes) -> Tuple[int, int]:
    """(h, w) of an encoded PNG/JPEG payload without decoding (header parse)."""
    lib = _load()
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.bts_peek_dims(_as_u8_ptr(data), len(data), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise ValueError(f"unrecognized/truncated image header ({len(data)} bytes)")
    return h.value, w.value


def decode_rgb_mem(data: bytes) -> np.ndarray:
    """Decode encoded PNG/JPEG bytes -> (h, w, 3) uint8, no crop.

    The ArrayRecord hot path (records carry encoded bytes; crop is applied
    downstream by the code shared with the PIL file path)."""
    lib = _load()
    sh, sw = peek_dims(data)
    out = np.empty((sh, sw, 3), np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.bts_decode_rgb_mem(
        _as_u8_ptr(data), len(data), CROP_NONE,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0 or h.value != sh or w.value != sw:
        raise IOError(f"native decode_rgb_mem failed (rc={rc}, {h.value}x{w.value})")
    return out


def decode_depth_mem(data: bytes) -> np.ndarray:
    """Decode uint16 depth-PNG bytes -> (h, w) float32 RAW COUNTS, no crop.

    inv_scale=1.0 keeps the record contract (scaling to meters happens in
    depth_from_png downstream, identical to the PIL path — f32 holds uint16
    exactly)."""
    lib = _load()
    sh, sw = peek_dims(data)
    out = np.empty((sh, sw), np.float32)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.bts_decode_depth_mem(
        _as_u8_ptr(data), len(data), CROP_NONE, 1.0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0 or h.value != sh or w.value != sw:
        raise IOError(f"native decode_depth_mem failed (rc={rc}, {h.value}x{w.value})")
    return out


class NativeBatchLoader:
    """C++-threaded batch prefetch over a fixed sample table.

    One instance per (split, geometry).  Per epoch, Python passes a shuffled
    index order; C++ workers decode `prefetch` batches ahead.
    """

    def __init__(
        self,
        image_paths: Sequence[str],
        depth_paths: Sequence[Optional[str]],
        focals: Sequence[float],
        batch: int,
        height: int,
        width: int,
        crop_mode: int,
        inv_scale: float,
        with_depth: bool = True,
        num_threads: int = 2,
        prefetch: int = 3,
    ):
        self.lib = _load()
        if self.lib is None:
            raise RuntimeError("native loader unavailable")
        n = len(image_paths)
        self._keepalive_img = [p.encode() for p in image_paths]
        self._keepalive_dep = [(p or "").encode() for p in depth_paths]
        img_arr = (ctypes.c_char_p * n)(*self._keepalive_img)
        dep_arr = (ctypes.c_char_p * n)(*self._keepalive_dep)
        foc_arr = (ctypes.c_float * n)(*[float(f) for f in focals])
        self.handle = self.lib.bts_loader_create(
            img_arr, dep_arr, foc_arr, n, batch, height, width, crop_mode,
            inv_scale, int(with_depth), num_threads, prefetch,
        )
        self.batch, self.h, self.w = batch, height, width
        self.with_depth = with_depth
        self.num_threads = num_threads
        self._n_batches = 0
        self._errors_seen = 0

    def start_epoch(self, order: np.ndarray) -> None:
        order = np.ascontiguousarray(order, np.int32)
        usable = len(order) - (len(order) % self.batch)
        order = order[:usable]
        rc = self.lib.bts_loader_start_epoch(
            self.handle, order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            usable, self.num_threads,
        )
        if rc != 0:
            raise RuntimeError(f"start_epoch failed rc={rc}")
        self._n_batches = usable // self.batch

    def __iter__(self):
        for _ in range(self._n_batches):
            images = np.empty((self.batch, self.h, self.w, 3), np.uint8)
            depths = np.empty((self.batch, self.h, self.w), np.float32) if self.with_depth else None
            focals = np.empty((self.batch,), np.float32)
            rc = self.lib.bts_loader_next(
                self.handle,
                images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                depths.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) if depths is not None else None,
                focals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if rc != 0:
                return
            # Decode failures zero-fill the affected sample's buffers; a
            # framework must never silently train on black frames, so any
            # new failure since the last batch is fatal (tf.data, the
            # reference's input plane, likewise errors out on bad decodes).
            err = self.errors()
            if err != self._errors_seen:
                n_new = err - self._errors_seen
                self._errors_seen = err
                raise RuntimeError(
                    f"native loader: {n_new} decode failure(s) (corrupt or "
                    f"missing input files; {err} total this loader)"
                )
            out = {"image": images, "focal": focals}
            if depths is not None:
                out["depth"] = depths
            yield out

    def errors(self) -> int:
        return self.lib.bts_loader_errors(self.handle)

    def close(self) -> None:
        if getattr(self, "handle", None):
            self.lib.bts_loader_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
