"""ResNet-50/101 and ResNeXt-50/101 backbones (linen, NHWC).

Reference parity: the ``--encoder resnet50_bts / resnet101_bts /
resnext50_bts / resnext101_bts`` families (SURVEY.md §2.5).  Standard
bottleneck-v1 topology; ResNeXt is the same network with grouped 3x3 convs,
expressed TPU-natively via ``feature_group_count`` (XLA lowers grouped convs
onto the MXU directly — no channel-split loop).

Returns features at strides [2, 4, 8, 16, 32]:
    [stem-relu (64), stage1 (256), stage2 (512), stage3 (1024), stage4 (2048)]
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bts_tpu.models.layers import BatchNorm, pad2


class Bottleneck(nn.Module):
    features: int  # output channels (4x the inner width for plain resnet)
    inner: int  # 3x3 conv width
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    pad_style: str = "same"  # stride-2 window alignment, see layers.pad2

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.inner, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.inner,
            (3, 3),
            strides=(self.stride, self.stride),
            # stride-1 SAME is symmetric pad-1 (== torch); only stride-2
            # windows differ between the conventions
            padding="SAME" if self.stride == 1 else pad2(3, self.pad_style),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            residual = BatchNorm(dtype=self.dtype)(residual, train)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    groups: int = 1
    width_per_group: int = 64
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint each bottleneck (memory for compute)
    pad_style: str = "same"  # stride-2 window alignment, see layers.pad2

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = nn.remat(Bottleneck, static_argnums=(2,)) if self.remat else Bottleneck
        feats = []
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=pad2(7, self.pad_style),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        feats.append(x)  # stride 2, 64ch
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pad2(3, self.pad_style))
        for i, num_blocks in enumerate(self.stage_sizes):
            out_ch = 256 * (2**i)
            if self.groups == 1:
                inner = 64 * (2**i)
            else:
                inner = self.groups * self.width_per_group * (2**i)
            for b in range(num_blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = block_cls(
                    out_ch, inner, stride=stride, groups=self.groups,
                    dtype=self.dtype, pad_style=self.pad_style,
                )(x, train)
            feats.append(x)  # strides 4, 8, 16, 32
        return feats
