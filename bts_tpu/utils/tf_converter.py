"""TF/Keras -> bts_tpu weight conversion (parity bridge, SURVEY.md §5/§7).

The reference is TF2/Keras; its released checkpoints are the golden source
for numeric-parity tests (abs_rel delta <= 1e-3, BASELINE.json).  This
module converts TF weights into bts_tpu's flax param PyTrees.

Layout contract (both sides NHWC):
- Conv kernels: TF (kh, kw, cin, cout) == flax (kh, kw, cin, cout) — copied
  verbatim.  Depthwise: TF (kh, kw, cin, multiplier) -> flax grouped-conv
  (kh, kw, 1, cin).
- Dense: TF (in, out) == flax (in, out).
- BatchNorm: TF gamma/beta/moving_mean/moving_variance ->
  flax scale/bias + batch_stats mean/var.

Because no reference checkpoint is available in this environment (empty
mount, no network), correctness is established by the round-trip test in
tests/test_tf_converter.py: build a TF Keras model and the equivalent flax
module, convert, and compare outputs to ~1e-5 — which pins down exactly the
semantics (SAME padding, BN eps, layouts) that reference-checkpoint loading
relies on.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def keras_layer_weights(model) -> List[Tuple[str, List[np.ndarray]]]:
    """[(layer_name, [weights...])] for layers that have weights."""
    out = []
    for layer in model.layers:
        ws = layer.get_weights()
        if ws:
            out.append((layer.name, [np.asarray(w) for w in ws]))
    return out


def convert_conv(kernel: np.ndarray, bias=None) -> Dict[str, np.ndarray]:
    """TF conv kernel (kh,kw,cin,cout) -> flax nn.Conv params."""
    p = {"kernel": kernel}
    if bias is not None:
        p["bias"] = bias
    return p


def convert_depthwise(kernel: np.ndarray) -> np.ndarray:
    """TF depthwise (kh,kw,cin,mult) -> flax grouped conv (kh,kw,1,cin*mult)."""
    kh, kw, cin, mult = kernel.shape
    return kernel.transpose(0, 1, 3, 2).reshape(kh, kw, 1, cin * mult)


def convert_bn(gamma, beta, mean, var) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """TF BN weights -> (flax params, flax batch_stats)."""
    return {"scale": gamma, "bias": beta}, {"mean": mean, "var": var}
