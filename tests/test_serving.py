"""HTTP serving driver (cli/bts_serve.py) + micro-batcher (utils/serving.py).

The server must reproduce the exported artifact's depth exactly, micro-batch
concurrent requests into one static-batch device call, and reject contract
violations (wrong shape, missing focal) with 400s.
"""

import io
import json
import os
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bts_tpu.config import Config
from bts_tpu.models import create_model
from bts_tpu.training.optimizer import make_optimizer
from bts_tpu.training.trainer import TrainState
from bts_tpu.utils.serving import MicroBatcher


def _tiny_cfg(**kw):
    base = dict(
        mode="test", encoder="mobilenetv2_bts", dataset="nyu", max_depth=10.0,
        bts_size=64, input_height=32, input_width=64, batch_size=2,
        compute_dtype="float32", serve_port=0, serve_linger_ms=30.0,
    )
    base.update(kw)
    return Config(**base)


def _state(cfg):
    model = create_model(cfg)
    x = jnp.zeros((cfg.batch_size, cfg.input_height, cfg.input_width, 3))
    variables = jax.jit(lambda k, xx: model.init(k, xx, False))(jax.random.PRNGKey(0), x)
    return model, TrainState.create(variables, make_optimizer(cfg, 1))


def _export_artifact(cfg, state, tmp_path):
    from bts_tpu.cli.bts_export import export_serving_fn

    path = os.path.join(tmp_path, "m.stablehlo")
    with open(path, "wb") as f:
        f.write(export_serving_fn(cfg, state))
    return path


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    from bts_tpu.cli.bts_serve import make_server
    from bts_tpu.data.augment import eval_preprocess

    cfg = _tiny_cfg()
    model, state = _state(cfg)
    cfg = cfg.replace(export_path=_export_artifact(cfg, state, tmp_path_factory.mktemp("srv")))
    server = make_server(cfg)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    port = server.server_address[1]

    def truth(images_u8):
        *_, final = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            eval_preprocess(jnp.asarray(images_u8)), False,
        )
        return np.asarray(final)

    yield port, truth
    server.shutdown()
    server.server_close()
    thread.join(timeout=5)


def _req(port, path, data=None, accept=None, method=None):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data, method=method)
    if accept:
        req.add_header("Accept", accept)
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.read(), r.headers.get("Content-Type", "")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type", "")


def _png_bytes(img):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_healthz(served):
    port, _ = served
    code, body, ctype = _req(port, "/healthz")
    assert code == 200 and ctype == "application/json"
    info = json.loads(body)
    assert info == {"status": "ok", "batch": 2, "height": 32, "width": 64,
                    "needs_focal": False, "dataset": "nyu"}


def test_depth_npy_matches_model(served):
    port, truth = served
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    code, body, ctype = _req(port, "/v1/depth", data=_png_bytes(img),
                             accept="application/octet-stream")
    assert code == 200 and ctype == "application/octet-stream", body
    got = np.load(io.BytesIO(body))
    want = truth(img[None])[0, ..., 0]
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_depth_png_scaling(served):
    from PIL import Image

    from bts_tpu.data.depth_io import depth_from_png

    port, truth = served
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 64, 3), dtype=np.uint8)
    code, body, ctype = _req(port, "/v1/depth", data=_png_bytes(img))
    assert code == 200 and ctype == "image/png", body
    png = np.array(Image.open(io.BytesIO(body)))
    assert png.dtype == np.uint16 and png.shape == (32, 64)
    want = truth(img[None])[0, ..., 0]
    np.testing.assert_allclose(depth_from_png(png, "nyu"), want, atol=1e-3)


def test_concurrent_requests_microbatch(served):
    port, truth = served
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (3, 32, 64, 3), dtype=np.uint8)  # > batch=2
    results = [None] * len(imgs)

    def hit(i):
        code, body, _ = _req(port, "/v1/depth", data=_png_bytes(imgs[i]),
                             accept="application/octet-stream")
        assert code == 200, body
        results[i] = np.load(io.BytesIO(body))

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    want = truth(imgs)[..., 0]
    for i in range(len(imgs)):
        np.testing.assert_allclose(results[i], want[i], rtol=0, atol=2e-5)


def test_bad_requests(served):
    port, _ = served
    # wrong spatial shape
    bad = np.zeros((16, 64, 3), np.uint8)
    code, body, _ = _req(port, "/v1/depth", data=_png_bytes(bad))
    assert code == 400 and b"resize client-side" in body
    # not an image
    code, body, _ = _req(port, "/v1/depth", data=b"not a png")
    assert code == 400 and b"decodable" in body
    # unknown path
    code, *_ = _req(port, "/v1/nope", data=b"", method="POST")
    assert code == 404


def test_kitti_requires_focal(tmp_path):
    from bts_tpu.cli.bts_serve import make_server

    cfg = _tiny_cfg(dataset="kitti", max_depth=80.0)
    _, state = _state(cfg)
    cfg = cfg.replace(export_path=_export_artifact(cfg, state, tmp_path))
    server = make_server(cfg)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        port = server.server_address[1]
        img = _png_bytes(np.zeros((32, 64, 3), np.uint8))
        code, body, _ = _req(port, "/v1/depth", data=img)
        assert code == 400 and b"focal" in body
        code, body, _ = _req(port, "/v1/depth?focal=715.0873", data=img,
                             accept="application/octet-stream")
        assert code == 200, body
        d = np.load(io.BytesIO(body))
        assert d.shape == (32, 64) and np.isfinite(d).all()
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=5)


def test_microbatcher_padding_and_errors():
    calls = []

    def fn(images):
        calls.append(images.shape)
        return images[..., :1].astype(np.float32) + 1.0

    mb = MicroBatcher(fn, batch=4, needs_focal=False, linger_ms=1.0)
    try:
        out = mb.submit(np.full((2, 3, 3), 7, np.uint8))  # 1 req -> padded to 4
        assert calls == [(4, 2, 3, 3)]
        np.testing.assert_array_equal(out, np.full((2, 3, 1), 8.0, np.float32))
    finally:
        mb.close()

    def boom(images):
        raise RuntimeError("device on fire")

    mb = MicroBatcher(boom, batch=2, needs_focal=False, linger_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="device on fire"):
            mb.submit(np.zeros((2, 3, 3), np.uint8))
    finally:
        mb.close()


class _Lazy:
    """Stands in for an async jax Array: materialization blocks, not dispatch."""

    def __init__(self, arr, delay_s):
        self._arr, self._delay = arr, delay_s

    def __array__(self, dtype=None, copy=None):
        time.sleep(self._delay)
        return self._arr if dtype is None else self._arr.astype(dtype)


def test_microbatcher_pipelined_groups_map_rows_correctly():
    """Double-buffered dispatch: results land on the right request even with
    a batch in flight while the next is collected, and deferred
    materialization errors still reach the right callers."""
    dispatched = []

    def fn(images):
        dispatched.append(images.copy())
        return _Lazy(images[..., :1].astype(np.float32) + 1.0, delay_s=0.03)

    mb = MicroBatcher(fn, batch=2, needs_focal=False, linger_ms=2.0)
    try:
        imgs = [np.full((2, 2, 3), i, np.uint8) for i in range(6)]
        with ThreadPoolExecutor(6) as ex:
            outs = list(ex.map(mb.submit, imgs))
        for i, out in enumerate(outs):
            np.testing.assert_array_equal(out, np.full((2, 2, 1), i + 1.0, np.float32))
        assert len(dispatched) >= 3  # 6 singles at batch=2 -> >= 3 device calls
    finally:
        mb.close()

    def lazy_boom(images):
        class _Boom:
            def __array__(self, dtype=None, copy=None):
                raise RuntimeError("async device failure")

        return _Boom()

    mb = MicroBatcher(lazy_boom, batch=2, needs_focal=False, linger_ms=1.0)
    try:
        with pytest.raises(RuntimeError, match="async device failure"):
            mb.submit(np.zeros((2, 3, 3), np.uint8))
    finally:
        mb.close()


def test_microbatcher_replica_pool_round_robins_devices():
    """With a device pool, micro-batches commit round-robin across devices
    and results still land on the right requests."""
    seen = []

    def fn(images):
        seen.append(tuple(images.devices()))
        return jnp.asarray(images[..., :1], jnp.float32) + 1.0

    devs = jax.devices()[:4]
    assert len(devs) == 4  # conftest provisions 8 virtual CPU devices
    mb = MicroBatcher(fn, batch=1, needs_focal=False, linger_ms=1.0, devices=devs)
    try:
        imgs = [np.full((2, 2, 3), i, np.uint8) for i in range(8)]
        with ThreadPoolExecutor(8) as ex:
            outs = list(ex.map(mb.submit, imgs))
        for i, out in enumerate(outs):
            np.testing.assert_array_equal(out, np.full((2, 2, 1), i + 1.0, np.float32))
        assert len({d for ds in seen for d in ds}) == 4  # every replica used
    finally:
        mb.close()


def test_microbatcher_close_flushes_in_flight_batch():
    """close() right after submit must still resolve the pending future."""
    def fn(images):
        return _Lazy(images[..., :1].astype(np.float32), delay_s=0.1)

    mb = MicroBatcher(fn, batch=2, needs_focal=False, linger_ms=50.0)
    fut_holder = []

    def submit():
        fut_holder.append(mb.submit(np.full((2, 2, 3), 5, np.uint8)))

    t = threading.Thread(target=submit)
    t.start()
    time.sleep(0.08)  # let the dispatcher pick it up / launch
    mb.close()
    t.join(timeout=5.0)
    assert not t.is_alive()
    np.testing.assert_array_equal(fut_holder[0], np.full((2, 2, 1), 5.0, np.float32))


@pytest.mark.slow
def test_sigterm_drains_and_exits_cleanly(tmp_path):
    """The scheduler's SIGTERM (pod drain / rollout) must stop accepting,
    flush the micro-batcher, and exit 0 — delivered for real to a subprocess
    running the public CLI (the handler's interplay with serve_forever on the
    main thread cannot be exercised in-process)."""
    import re
    import signal
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "serve_worker.py")
    out_path = os.path.join(str(tmp_path), "serve.log")
    with open(out_path, "w") as out:
        proc = subprocess.Popen(
            [
                sys.executable, worker,
                "--dataset", "nyu", "--encoder", "mobilenetv2_bts",
                "--bts_size", "64", "--max_depth", "10",
                "--compute_dtype", "float32", "--input_height", "64",
                "--input_width", "96", "--batch_size", "2",
                "--num_devices", "1", "--serve_port", "0",
            ],
            cwd=repo,
            stdout=out,
            stderr=subprocess.STDOUT,
            text=True,
        )
        try:
            deadline = time.time() + 600
            port = None
            while time.time() < deadline:
                m = re.search(r"serving depth on http://[^:]+:(\d+)", open(out_path).read())
                if m:
                    port = int(m.group(1))
                    break
                if proc.poll() is not None:
                    pytest.fail(f"server exited early:\n{open(out_path).read()}")
                time.sleep(0.5)
            assert port, f"server never came up:\n{open(out_path).read()}"

            status, body, _ = _req(port, "/healthz")
            assert status == 200 and json.loads(body)["status"] == "ok"

            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=120)
        finally:
            if proc.poll() is None:
                proc.kill()
    log = open(out_path).read()
    assert rc == 0, f"SIGTERM must exit 0:\n{log}"
    assert "draining and stopping" in log, log
