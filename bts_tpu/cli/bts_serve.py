"""HTTP depth-inference server over an exported (or in-process) serving fn.

A TPU-native production-serving extension with no reference counterpart
(the reference lineage stops at the batch test driver, SURVEY.md §2.2).
Serves single-image HTTP requests against the static-batch TPU program by
micro-batching them (``utils/serving.MicroBatcher``): concurrent requests
within a ``--serve_linger_ms`` window share one device call.

    python -m bts_tpu.cli.bts_serve --export_path model.stablehlo \
        --dataset kitti --serve_port 8502
    # or straight from a checkpoint (same flags as bts_test):
    python -m bts_tpu.cli.bts_serve @arguments/arguments_test_eigen.txt

Endpoints (stdlib http.server; zero extra dependencies):

- ``GET /healthz`` -> JSON ``{status, batch, height, width, needs_focal}``.
- ``POST /v1/depth`` -> depth for ONE image.  Body: PNG/JPEG bytes at
  exactly (height, width); KITTI artifacts additionally require
  ``?focal=<px>``.  Response: uint16 depth PNG in the dataset scaling
  (kitti x256 / nyu x1000), or raw float32 ``.npy`` meters when the
  request sends ``Accept: application/octet-stream``.

Shape mismatches and missing focal fail with 400 + the expected contract;
serving keeps static shapes (resize belongs client-side, where the focal
length must be adjusted with it).
"""

from __future__ import annotations

import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np
from PIL import Image

import jax

from bts_tpu.config import parse_args
from bts_tpu.data.depth_io import depth_to_png
from bts_tpu.utils.serving import MicroBatcher, load_exported


def build_backend(cfg):
    """-> (fn, batch, height, width, needs_focal); exported file or checkpoint."""
    if cfg.export_path:
        serve = load_exported(cfg.export_path)
        aval = serve.exported.in_avals[0]
        b, h, w = aval.shape[0], aval.shape[1], aval.shape[2]
        return serve, b, h, w, len(serve.exported.in_avals) == 2
    # in-process: restore the checkpoint and jit the same closure bts_export
    # serializes (slower start, no artifact file needed)
    import jax.numpy as jnp

    from bts_tpu.cli.bts_export import build_serve_fn
    from bts_tpu.cli.bts_test import restore_state
    from bts_tpu.models import create_model

    model = create_model(cfg)
    sample = jnp.zeros((cfg.batch_size, cfg.input_height, cfg.input_width, 3), jnp.float32)
    state = restore_state(cfg, model, sample)
    serve, use_focal = build_serve_fn(cfg, state)
    return jax.jit(serve), cfg.batch_size, cfg.input_height, cfg.input_width, use_focal


def make_server(cfg) -> ThreadingHTTPServer:
    """Build the HTTP server (not yet serving; caller runs serve_forever)."""
    fn, batch, height, width, needs_focal = build_backend(cfg)
    # --num_devices N > 1 turns the micro-batcher into a replica pool:
    # micro-batches round-robin across devices, one in flight per device
    # (weights replicate per device on first use; the exported artifact /
    # jitted closure compiles once per placement).
    n_dev = cfg.num_devices if cfg.num_devices > 0 else len(jax.local_devices())
    devices = jax.local_devices()[:n_dev] if n_dev > 1 else None
    if devices:
        print(f"[bts_tpu] replica pool over {len(devices)} devices")
    batcher = MicroBatcher(fn, batch, needs_focal=needs_focal,
                           linger_ms=cfg.serve_linger_ms, devices=devices)
    dataset = cfg.dataset

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stdout is the server log
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if urlparse(self.path).path == "/healthz":
                self._json(200, {
                    "status": "ok", "batch": batch, "height": height,
                    "width": width, "needs_focal": needs_focal, "dataset": dataset,
                })
            else:
                self._json(404, {"error": "unknown path; endpoints: GET /healthz, POST /v1/depth"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/v1/depth":
                self._json(404, {"error": "unknown path; endpoints: GET /healthz, POST /v1/depth"})
                return
            try:
                body = self.rfile.read(int(self.headers.get("Content-Length", "0")))
                img = np.asarray(Image.open(io.BytesIO(body)).convert("RGB"), np.uint8)
            except Exception as e:
                self._json(400, {"error": f"body must be a decodable PNG/JPEG image: {e}"})
                return
            if img.shape != (height, width, 3):
                self._json(400, {"error": f"image shape {img.shape} != exported ({height}, {width}, 3); resize client-side"})
                return
            q = parse_qs(url.query)
            focal = None
            if needs_focal:
                if "focal" not in q:
                    self._json(400, {"error": "KITTI artifact: ?focal=<px> is required"})
                    return
                try:
                    focal = float(q["focal"][0])
                except ValueError:
                    self._json(400, {"error": f"bad focal {q['focal'][0]!r}"})
                    return
            try:
                depth_m = batcher.submit(img, focal)  # (H, W, 1) f32 meters
            except Exception as e:
                self._json(500, {"error": f"inference failed: {e}"})
                return
            depth_m = np.asarray(depth_m)[..., 0]
            if self.headers.get("Accept", "") == "application/octet-stream":
                buf = io.BytesIO()
                np.save(buf, depth_m.astype(np.float32))
                self._send(200, buf.getvalue(), "application/octet-stream")
            else:
                buf = io.BytesIO()
                Image.fromarray(depth_to_png(depth_m, dataset)).save(buf, format="PNG")
                self._send(200, buf.getvalue(), "image/png")

    server = ThreadingHTTPServer(("0.0.0.0", cfg.serve_port), Handler)
    server.batcher = batcher  # for tests / clean shutdown
    _orig_shutdown = server.shutdown

    def shutdown():
        _orig_shutdown()
        batcher.close()

    server.shutdown = shutdown
    return server


def main(argv=None):
    cfg = parse_args(argv, mode="test")
    from bts_tpu.config import adopt_sidecar_geometry

    cfg = adopt_sidecar_geometry(cfg)  # trained-run stride-2 geometry, if recorded
    server = make_server(cfg)
    host, port = server.server_address[:2]
    print(f"[bts_tpu] serving depth on http://{host}:{port} "
          f"(batch={server.batcher.batch}, linger={cfg.serve_linger_ms} ms); Ctrl-C to stop")

    # SIGTERM = the scheduler's stop (pod drain / rollout): stop accepting,
    # let in-flight micro-batches finish, exit 0 — same contract as the train
    # driver's preemption guard.  shutdown() blocks until serve_forever
    # returns, and serve_forever runs on THIS thread, so the handler must
    # fire it from a helper thread or the process deadlocks.
    import signal
    import threading

    def _drain(signum, frame):
        print(f"[bts_tpu] received signal {signum}: draining and stopping", flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    prev_term = signal.signal(signal.SIGTERM, _drain)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        server.shutdown()
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
