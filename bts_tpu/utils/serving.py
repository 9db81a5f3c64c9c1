"""Serving-side loader for exported BTS inference functions.

Counterpart of ``cli/bts_export.py`` (a TPU-native serving extension; the
reference lineage has no export story — SURVEY.md §2 inventory ends at the
test driver).  The artifact is a serialized ``jax.export.Exported``:
StableHLO plus calling convention, with the restored checkpoint weights
baked in as constants.  Loading requires only jax — not bts_tpu, not the
checkpoint, not the model code — and the call is jit-compatible:

    from bts_tpu.utils.serving import load_exported
    serve = load_exported("model.stablehlo")
    depth = serve(images_u8)            # (B, H, W, 3) u8 -> (B, H, W, 1) f32

Shape/dtype contracts are embedded in the artifact; mismatched calls fail
loudly with the expected signature.
"""

from __future__ import annotations

import queue
import threading
from collections import deque
from concurrent.futures import Future

import numpy as np

import jax


def load_exported(path: str):
    """Deserialize an exported serving fn; returns a jit-compatible callable."""
    with open(path, "rb") as f:
        exp = jax.export.deserialize(bytearray(f.read()))

    def serve(*args):
        return exp.call(*args)

    serve.exported = exp  # expose .in_avals / .platforms for introspection
    return serve


class MicroBatcher:
    """Collect concurrent single-image requests into static-batch device calls.

    TPU serving wants ONE static batch shape (recompilation is seconds, so
    the exported artifact is fixed at ``batch``); production traffic arrives
    one request at a time.  The standard reconciliation is micro-batching: a
    dispatcher thread drains a queue, waits up to ``linger_ms`` for up to
    ``batch`` requests, zero-pads the remainder, runs ONE device call, and
    scatters the result rows back to per-request futures.  The device is
    driven from a single thread (the dev tunnel — and most serving setups —
    are effectively single-flight), while any number of HTTP threads block
    in :meth:`submit`.  Dispatch is pipelined: with ``devices`` given, the
    batcher becomes a *replica pool* — successive micro-batches are
    committed round-robin to each device (the jitted fn compiles once per
    placement and the replicated weights are transferred on first use), so
    up to ``len(devices)`` batches compute concurrently; without
    ``devices`` it keeps one batch in flight (double-buffering), which
    already overlaps host-side decode with device compute.
    """

    def __init__(self, fn, batch: int, *, needs_focal: bool, linger_ms: float = 5.0,
                 devices=None):
        self._fn = fn
        self.batch = int(batch)
        self.needs_focal = bool(needs_focal)
        self.linger_s = float(linger_ms) / 1e3
        self._devices = list(devices) if devices else []
        self._max_inflight = max(1, len(self._devices))
        self._rr = 0  # next replica (round-robin)
        self._q: queue.Queue = queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True, name="bts-microbatch")
        self._thread.start()

    def submit(self, image_u8: np.ndarray, focal: float | None = None) -> np.ndarray:
        """Blocking: returns this image's (H, W, 1) depth row."""
        fut: Future = Future()
        self._q.put((np.asarray(image_u8, dtype=np.uint8), focal, fut))
        return fut.result()

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)  # unblock the dispatcher
        self._thread.join(timeout=5.0)

    # -- dispatcher -------------------------------------------------------

    def _take(self, block: bool, timeout: float | None):
        try:
            item = self._q.get(block=block, timeout=timeout)
        except queue.Empty:
            return None
        if item is None:  # close() sentinel
            return None
        return item

    def _loop(self) -> None:
        # Pipelined: jax dispatch is async, so after launching a batch we go
        # straight back to collecting the next one and only materialize
        # (block on) the OLDEST in-flight result once a launch slot is
        # needed — host decode/collect overlaps device compute.  At most
        # one batch is in flight per replica (one total without a device
        # pool); with no follow-up traffic the idle poll drains the
        # pipeline within <= linger_ms per batch.
        pending: deque = deque()  # (group, unmaterialized device result)
        while not self._stop.is_set():
            first = self._take(block=True, timeout=self.linger_s if pending else None)
            if first is None:
                if pending:
                    self._scatter(*pending.popleft())
                continue
            group = [first]
            while len(group) < self.batch:
                nxt = self._take(block=True, timeout=self.linger_s)
                if nxt is None:
                    break
                group.append(nxt)
            if len(pending) >= self._max_inflight:  # free the oldest slot
                self._scatter(*pending.popleft())
            out = self._dispatch(group)
            if out is not None:
                pending.append((group, out))
        while pending:  # close() mid-flight: flush the remaining batches
            self._scatter(*pending.popleft())

    def _dispatch(self, group):
        """Launch one device call; returns the (async) result or None on error."""
        n = len(group)
        images = np.stack([g[0] for g in group])
        if n < self.batch:
            pad = np.zeros((self.batch - n,) + images.shape[1:], np.uint8)
            images = np.concatenate([images, pad])
        try:
            args = [images]
            if self.needs_focal:
                args.append(np.asarray(
                    [g[1] if g[1] is not None else 0.0 for g in group]
                    + [1.0] * (self.batch - n),
                    np.float32,
                ))
            if self._devices:  # commit inputs to the next replica's device
                dev = self._devices[self._rr]
                self._rr = (self._rr + 1) % len(self._devices)
                args = [jax.device_put(a, dev) for a in args]
            return self._fn(*args)
        except Exception as e:  # scatter the failure to every caller
            for _, _, fut in group:
                fut.set_exception(e)
            return None

    def _scatter(self, group, out) -> None:
        """Materialize a dispatched result and resolve its futures."""
        try:
            out = np.asarray(out)  # blocks; async device errors surface here
        except Exception as e:
            for _, _, fut in group:
                fut.set_exception(e)
            return
        for i, (_, _, fut) in enumerate(group):
            fut.set_result(out[i])
