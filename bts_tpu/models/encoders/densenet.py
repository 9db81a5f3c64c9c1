"""DenseNet-121/161 backbones (linen, NHWC).

Reference parity: ``--encoder densenet121_bts / densenet161_bts``
(SURVEY.md §2.5).  DenseNet-161 is the reference's flagship backbone; it is
NOT in keras.applications, so like the fork we implement it directly.

Topology (standard DenseNet, Huang et al. 2017):
    stem: 7x7/2 conv (num_init_features) -> BN -> ReLU -> 3x3/2 maxpool
    4 dense blocks of (6,12,24,16) [121] / (6,12,36,24) [161] layers,
    growth rate 32 / 48; each dense layer = BN-ReLU-1x1(4k)-BN-ReLU-3x3(k);
    transitions = BN-ReLU-1x1(ch/2)-avgpool/2 between blocks;
    final BN ("norm5").

Feature taps for the BTS decoder (strides 2/4/8/16/32), matching the
reference encoder's ['relu0','pool0','transition1','transition2','norm5']:
    relu0 (H/2), pool0 (H/4), transition1-pool (H/8), transition2-pool (H/16),
    norm5 (H/32, pre-ReLU — decoder applies the ReLU).

TPU note: dense-block concatenation is pure memory layout — XLA fuses the
concats into the consuming convs; channel counts stay multiples of the
growth rate, which keeps the MXU tiling dense.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from bts_tpu.models.layers import BatchNorm


class DenseLayer(nn.Module):
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = BatchNorm(dtype=self.dtype)(x, train)
        y = nn.relu(y)
        y = nn.Conv(
            4 * self.growth_rate, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32
        )(y)
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.growth_rate, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_features, (1, 1), use_bias=False, dtype=self.dtype, param_dtype=jnp.float32
        )(x)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    num_init_features: int = 64
    dtype: Any = jnp.float32
    remat: bool = False  # checkpoint each dense layer (memory for compute)

    @nn.compact
    def __call__(self, x, train: bool = False):
        layer_cls = nn.remat(DenseLayer, static_argnums=(2,)) if self.remat else DenseLayer
        feats = []
        x = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2), padding="SAME",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        feats.append(x)  # relu0: H/2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        feats.append(x)  # pool0: H/4

        ch = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            for _ in range(num_layers):
                x = layer_cls(self.growth_rate, dtype=self.dtype)(x, train)
                ch += self.growth_rate
            if i != len(self.block_config) - 1:
                ch = ch // 2
                x = Transition(ch, dtype=self.dtype)(x, train)
                if i < 2:
                    feats.append(x)  # transition1: H/8, transition2: H/16
        x = BatchNorm(dtype=self.dtype)(x, train)  # norm5, pre-ReLU
        feats.append(x)  # H/32
        return feats
