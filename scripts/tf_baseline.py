"""Measure the TF-CPU baseline: images/sec at 352x1216, DenseNet-161 BTS.

No throughput numbers are published for the reference lineage
(BASELINE.json "published": {}), so the north-star ">=5x TF-CPU baseline"
requires measuring a faithful TF2 re-expression of the reference's compute:
DenseNet-161 encoder + BTS dense-ASPP decoder + tile/reshape LPG heads
(the fork's "fully TF" style — pure tf ops, no custom kernels), run on CPU
exactly as `bts_test.py` would (batch 1, KB-crop eval geometry, float32).

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it to
compute vs_baseline.

Usage: python scripts/tf_baseline.py [--iters 10] [--height 352] [--width 1216]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np
import tensorflow as tf

L = tf.keras.layers

_SEQ = [0]


def _nm(kind: str) -> str:
    """Construction-ordered layer name: seq<N>_<kind>.  The flax converter
    (utils/tf_model_converter.keras_streams) sorts weighted layers by <N> —
    Keras's model.layers is topological order, which permutes parallel
    branches relative to code order."""
    _SEQ[0] += 1
    return f"seq{_SEQ[0]}_{kind}"


def conv2d(*args, **kw):
    kw.setdefault("name", _nm("conv"))
    return L.Conv2D(*args, **kw)


def bn():
    return L.BatchNormalization(epsilon=1.1e-5, name=_nm("bn"))


def dense_block(x, num_layers: int, growth_rate: int, name: str):
    for i in range(num_layers):
        y = bn()(x)
        y = L.ReLU()(y)
        y = conv2d(4 * growth_rate, 1, use_bias=False)(y)
        y = bn()(y)
        y = L.ReLU()(y)
        y = conv2d(growth_rate, 3, padding="same", use_bias=False)(y)
        x = L.Concatenate()([x, y])
    return x


def transition(x, reduction: float, name: str):
    ch = int(x.shape[-1] * reduction)
    x = bn()(x)
    x = L.ReLU()(x)
    x = conv2d(ch, 1, use_bias=False)(x)
    return L.AveragePooling2D(2)(x)


def densenet_encoder(inp, growth=48, blocks=(6, 12, 36, 24), init_features=96):
    """DenseNet (default: -161, growth 48, blocks 6/12/36/24) with BTS taps."""
    x = conv2d(init_features, 7, strides=2, padding="same", use_bias=False)(inp)
    x = bn()(x)
    x = L.ReLU()(x)
    skip2 = x  # stride 2 (relu0 — the reference taps AFTER the stem ReLU)
    x = L.MaxPooling2D(3, strides=2, padding="same")(x)
    skip4 = x  # stride 4 (pool0)
    skips = []
    for i, n in enumerate(blocks):
        x = dense_block(x, n, growth, f"db{i + 1}")
        if i < len(blocks) - 1:
            x = transition(x, 0.5, f"tr{i + 1}")
            if i < 2:
                skips.append(x)
    skip8, skip16 = skips
    x = bn()(x)
    return skip2, skip4, skip8, skip16, x


def atrous(x, ch: int, rate: int, first: bool):
    if not first:
        x = bn()(x)
    x = L.ReLU()(x)
    x = conv2d(ch * 2, 1)(x)
    x = bn()(x)
    x = L.ReLU()(x)
    return conv2d(ch, 3, padding="same", dilation_rate=rate)(x)


def upconv(x, ch: int):
    x = L.UpSampling2D(2, interpolation="nearest")(x)
    return conv2d(ch, 3, padding="same", activation="elu")(x)


def reduction_1x1(x, nf: int, is_final: bool = False):
    while nf >= 4:
        if nf < 8:
            return conv2d(1 if is_final else 3, 1)(x)
        x = conv2d(nf, 1, activation="elu")(x)
        nf //= 2
    return x


def lpg_tf(raw3, k: int, max_depth: float):
    """Fully-TF LPG: spherical params -> plane -> kxk expansion (tile/reshape)."""
    theta = tf.sigmoid(raw3[..., 0]) * (np.pi / 3)
    phi = tf.sigmoid(raw3[..., 1]) * (np.pi * 2)
    dist = tf.sigmoid(raw3[..., 2]) * max_depth
    n1 = tf.sin(theta) * tf.cos(phi)
    n2 = tf.sin(theta) * tf.sin(phi)
    n3 = tf.cos(theta)
    b = tf.shape(raw3)[0]
    h, w = raw3.shape[1], raw3.shape[2]
    coords = (np.arange(k, dtype=np.float32) - (k - 1) / 2.0) / k
    u = tf.constant(coords.reshape(1, 1, 1, 1, k))
    v = tf.constant(coords.reshape(1, 1, k, 1, 1))
    n1e = n1[:, :, None, :, None]
    n2e = n2[:, :, None, :, None]
    n3e = n3[:, :, None, :, None]
    n4e = dist[:, :, None, :, None]
    depth = n4e / (n1e * u + n2e * v + n3e)
    return tf.reshape(depth, [b, h * k, w * k, 1])


def nearest_down(x, f: int):
    """Nearest 1/f downsample (strided slice) — matches the reference
    lineage's F.interpolate(mode='nearest') and bts_tpu's ops.resize."""
    return L.Lambda(lambda t: t[:, ::f, ::f, :])(x)


def build_bts_tf(height: int, width: int, max_depth: float = 80.0, nf: int = 512,
                 growth=48, blocks=(6, 12, 36, 24), init_features=96,
                 debug_outputs: bool = False):
    _SEQ[0] = 0
    inp = tf.keras.Input((height, width, 3))
    skip2, skip4, skip8, skip16, bott = densenet_encoder(inp, growth, blocks, init_features)
    x = L.ReLU()(bott)
    x = upconv(x, nf)
    x = bn()(x)
    x = conv2d(nf, 3, padding="same", activation="elu")(L.Concatenate()([x, skip16]))
    x = upconv(x, nf // 2)
    x = bn()(x)
    c4 = L.Concatenate()([x, skip8])
    x = conv2d(nf // 2, 3, padding="same", activation="elu")(c4)
    x = bn()(x)
    d3 = atrous(x, nf // 4, 3, True)
    c = L.Concatenate()([c4, d3])
    d6 = atrous(c, nf // 4, 6, False)
    c = L.Concatenate()([c, d6])
    d12 = atrous(c, nf // 4, 12, False)
    c = L.Concatenate()([c, d12])
    d18 = atrous(c, nf // 4, 18, False)
    c = L.Concatenate()([c, d18])
    d24 = atrous(c, nf // 4, 24, False)
    daspp = conv2d(nf // 4, 3, padding="same", activation="elu")(
        L.Concatenate()([x, d3, d6, d12, d18, d24])
    )
    lpg = lambda k: L.Lambda(lambda t: lpg_tf(t, k, max_depth) / max_depth)
    depth8 = lpg(8)(reduction_1x1(daspp, nf // 4))
    x = upconv(daspp, nf // 4)
    x = bn()(x)
    x = conv2d(nf // 4, 3, padding="same", activation="elu")(
        L.Concatenate()([x, skip4, nearest_down(depth8, 4)])
    )
    depth4 = lpg(4)(reduction_1x1(x, nf // 8))
    x = upconv(x, nf // 8)
    x = bn()(x)
    x = conv2d(nf // 8, 3, padding="same", activation="elu")(
        L.Concatenate()([x, skip2, nearest_down(depth4, 2)])
    )
    depth2 = lpg(2)(reduction_1x1(x, nf // 16))
    x = upconv(x, nf // 16)
    depth1 = L.Activation('sigmoid')(reduction_1x1(x, nf // 32, is_final=True))
    x = conv2d(nf // 16, 3, padding="same", activation="elu")(
        L.Concatenate()([x, depth1, depth2, depth4, depth8])
    )
    out = L.Lambda(lambda t: max_depth * tf.sigmoid(t))(conv2d(1, 3, padding="same")(x))
    if debug_outputs:
        return tf.keras.Model(
            inp, [skip2, skip4, skip8, skip16, bott, daspp, depth8, depth4, depth2, depth1, out]
        )
    return tf.keras.Model(inp, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--height", type=int, default=352)
    ap.add_argument("--width", type=int, default=1216)
    args = ap.parse_args()

    tf.config.set_visible_devices([], "GPU")
    model = build_bts_tf(args.height, args.width)
    fwd = tf.function(lambda x: model(x, training=False))
    x = tf.constant(np.random.rand(1, args.height, args.width, 3).astype(np.float32))
    fwd(x)  # trace + compile
    t0 = time.perf_counter()
    fwd(x)
    warm = time.perf_counter() - t0
    n = args.iters
    t0 = time.perf_counter()
    for _ in range(n):
        y = fwd(x)
    _ = y.numpy()
    dt = time.perf_counter() - t0
    ips = n / dt
    print(f"TF-CPU: {ips:.4f} images/sec ({dt / n * 1000:.1f} ms/img, warm {warm:.1f}s)")
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BASELINE_MEASURED.json")
    with open(out_path, "w") as f:
        json.dump(
            {
                "tf_cpu_images_per_sec": round(ips, 4),
                "geometry": f"{args.height}x{args.width}",
                "model": "densenet161_bts (TF2/Keras re-expression)",
                "iters": n,
            },
            f,
            indent=1,
        )
    print(f"wrote {os.path.abspath(out_path)}")


if __name__ == "__main__":
    main()
