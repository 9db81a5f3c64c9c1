"""MobileNetV2 backbone (linen, NHWC).

Reference parity: ``--encoder mobilenetv2_bts`` (SURVEY.md §2.5) — the
lightweight option used for the CPU-inference baseline config
(BASELINE.json config #1).

Standard MobileNetV2 (Sandler et al. 2018): 3x3/2 stem (32ch) then inverted
residual bottlenecks (expansion t, channels c, repeats n, stride s):
    (1,16,1,1) (6,24,2,2) (6,32,3,2) (6,64,4,2) (6,96,3,1)
    (6,160,3,2) (6,320,1,1)
followed by a 1x1 conv to 1280.  ReLU6 activations, BN everywhere.

Feature taps at strides 2/4/8/16/32 for the BTS decoder:
    16ch (H/2), 24ch (H/4), 32ch (H/8), 96ch (H/16), 1280ch (H/32).

TPU note: depthwise convs run on the VPU, not the MXU — MobileNet trades MXU
FLOPs for bandwidth, so its TPU win is smaller than on CPU; it exists for
parity and edge-eval configs.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from bts_tpu.models.layers import BatchNorm, pad2


def relu6(x):
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


class InvertedResidual(nn.Module):
    features: int
    stride: int = 1
    expand: int = 6
    dtype: Any = jnp.float32
    pad_style: str = "same"  # stride-2 window alignment, see layers.pad2

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        y = x
        if self.expand != 1:
            y = nn.Conv(
                in_ch * self.expand, (1, 1), use_bias=False,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(y)
            y = BatchNorm(dtype=self.dtype)(y, train)
            y = relu6(y)
        # depthwise 3x3 (stride-1 SAME is symmetric pad-1 == torch)
        y = nn.Conv(
            y.shape[-1], (3, 3), strides=(self.stride, self.stride),
            padding="SAME" if self.stride == 1 else pad2(3, self.pad_style),
            feature_group_count=y.shape[-1], use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = relu6(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        if self.stride == 1 and in_ch == self.features:
            y = y + x
        return y


# (expansion, channels, repeats, stride)
_MBV2_CONFIG = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint each inverted residual
    pad_style: str = "same"  # stride-2 window alignment, see layers.pad2

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = (
            nn.remat(InvertedResidual, static_argnums=(2,)) if self.remat else InvertedResidual
        )
        x = nn.Conv(
            32, (3, 3), strides=(2, 2), padding=pad2(3, self.pad_style),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = relu6(x)

        feats = []
        tap_channels = {16: 0, 24: 1, 32: 2, 96: 3}  # c -> tap order
        for t, c, n, s in _MBV2_CONFIG:
            for i in range(n):
                stride = s if i == 0 else 1
                x = block_cls(
                    c, stride=stride, expand=t, dtype=self.dtype, pad_style=self.pad_style
                )(x, train)
            if c in tap_channels:
                feats.append(x)  # H/2 (16), H/4 (24), H/8 (32), H/16 (96)
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        feats.append(x)  # H/32, pre-ReLU (decoder applies ReLU)
        return feats
