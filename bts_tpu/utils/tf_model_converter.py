"""Whole-model TF/Keras BTS checkpoint -> bts_tpu flax variables.

This is the golden-parity bridge (SURVEY.md §4/§7: load the reference's
released TF checkpoints, compare Eigen-split metrics to abs_rel <= 1e-3).
With no reference checkpoint available offline, correctness is pinned by
tests/test_tf_parity.py: build the equivalent Keras BTS
(scripts/tf_baseline.py) and the flax BtsModel at the same tiny
architecture, convert random TF weights, and require output agreement to
~1e-4 — which proves the two graphs are the same network layer for layer.

Strategy: ordered-stream assignment.  Both sides construct layers in
identical order (the topology), so enumerating "conv-like" weights and BN
weight groups in construction order on each side yields aligned streams:
Keras -> model.layers order; flax -> the insertion order of the variables
dict (linen inserts params in call order during init).  Shapes are verified
leaf by leaf, so any drift fails loudly rather than silently.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def flax_streams(params: dict, batch_stats: dict):
    """(conv_paths, bn_paths) in construction order.

    conv path -> dict with 'kernel' (+ optional 'bias'); bn path -> the
    inner nn.BatchNorm group holding {scale, bias} / {mean, var}.
    """
    convs: List[Tuple[str, ...]] = []
    bns: List[Tuple[str, ...]] = []

    def walk(node, path):
        for k, v in node.items():
            if not isinstance(v, dict):
                continue
            if "kernel" in v:
                convs.append(path + (k,))
            elif "scale" in v and "bias" in v:
                bns.append(path + (k,))
            else:
                walk(v, path + (k,))

    walk(params, ())
    return convs, bns


def keras_streams(model):
    """(conv_layers, bn_layers) in graph-construction order.

    ``model.layers`` is topological order, which permutes parallel branches
    (e.g. a reduction head vs. the next upconv) relative to code order.
    Layers named ``seq<N>_...`` (scripts/tf_baseline.py) are sorted by N;
    other models keep their layers order.
    """
    import re

    weighted = [l for l in model.layers if l.get_weights()]
    seq = [re.match(r"seq(\d+)_", l.name) for l in weighted]
    if all(seq):
        weighted.sort(key=lambda l: int(re.match(r"seq(\d+)_", l.name).group(1)))
    convs, bns = [], []
    for layer in weighted:
        ws = layer.get_weights()
        if ws[0].ndim == 4:
            convs.append(layer)
        elif len(ws) == 4 and ws[0].ndim == 1:
            bns.append(layer)
        else:  # pragma: no cover - no dense layers in BTS
            raise ValueError(f"unexpected weighted layer {layer.name}: {[w.shape for w in ws]}")
    return convs, bns


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, key, value):
    node = _get(tree, path)
    expected = np.shape(node[key])
    if tuple(expected) != tuple(np.shape(value)):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}/{key}: flax {expected} vs tf {np.shape(value)}"
        )
    node[key] = value


def convert_keras_model(model, variables: dict) -> dict:
    """Assign a Keras BTS model's weights onto a flax variables dict copy."""
    import copy

    import jax.numpy as jnp

    from bts_tpu.utils.torch_converter import jax_to_py

    params = copy.deepcopy(jax_to_py(variables["params"]))
    stats = copy.deepcopy(jax_to_py(variables.get("batch_stats", {})))
    f_convs, f_bns = flax_streams(params, stats)
    k_convs, k_bns = keras_streams(model)
    if len(f_convs) != len(k_convs) or len(f_bns) != len(k_bns):
        raise ValueError(
            f"stream mismatch: flax {len(f_convs)} convs / {len(f_bns)} BNs, "
            f"keras {len(k_convs)} convs / {len(k_bns)} BNs"
        )
    for path, layer in zip(f_convs, k_convs):
        ws = layer.get_weights()
        _set(params, path, "kernel", jnp.asarray(ws[0], jnp.float32))
        if len(ws) > 1:
            _set(params, path, "bias", jnp.asarray(ws[1], jnp.float32))
    for path, layer in zip(f_bns, k_bns):
        gamma, beta, mean, var = layer.get_weights()
        _set(params, path, "scale", jnp.asarray(gamma, jnp.float32))
        _set(params, path, "bias", jnp.asarray(beta, jnp.float32))
        _set(stats, path, "mean", jnp.asarray(mean, jnp.float32))
        _set(stats, path, "var", jnp.asarray(var, jnp.float32))
    return {"params": params, "batch_stats": stats}


def load_keras_checkpoint(variables: dict, path: str, build_fn=None) -> dict:
    """Load a reference TF checkpoint (SavedModel/.keras/.h5) and convert."""
    import tensorflow as tf

    model = tf.keras.models.load_model(path, compile=False) if build_fn is None else build_fn()
    if build_fn is not None:
        model.load_weights(path)
    return convert_keras_model(model, variables)
