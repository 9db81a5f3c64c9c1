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
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from bts_tpu.models.layers import BatchNorm, pad2


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
        # checkpoint_name: inert without remat; under remat_policy='convs'
        # the save_only_these_names policy keeps the two conv outputs and
        # rematerializes only the BN/ReLU elementwise work
        y = checkpoint_name(y, "dense_1x1_out")
        y = BatchNorm(dtype=self.dtype)(y, train)
        y = nn.relu(y)
        y = nn.Conv(
            self.growth_rate, (3, 3), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(y)
        y = checkpoint_name(y, "dense_3x3_out")
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


def _dense_block(mdl: "DenseNet", x, train: bool, layer_ids: Tuple[int, ...]):
    """One dense block as a remattable function.

    Layers get EXPLICIT names matching the auto-assigned global indices
    (``DenseLayer_<i>``), so the param tree is identical across remat
    policies (checkpoints, converters, freeze_prefixes all unaffected).
    """
    for li in layer_ids:
        x = DenseLayer(mdl.growth_rate, dtype=mdl.dtype, name=f"DenseLayer_{li}")(x, train)
    return x


class DenseNet(nn.Module):
    growth_rate: int = 32
    block_config: Tuple[int, ...] = (6, 12, 24, 16)
    num_init_features: int = 64
    dtype: Any = jnp.float32
    remat: bool = False  # trade recompute for memory in the backward
    # remat granularity (measured on config 4, see PERFORMANCE.md):
    #   'layer' - checkpoint each dense layer (saves layer inputs)
    #   'block' - checkpoint whole dense blocks (saves block boundaries only,
    #             recomputes a full block per backward step; min memory)
    #   'convs' - per-layer boundary, but keep the two conv outputs
    #             (rematerializes only BN/ReLU elementwise work)
    remat_policy: str = "layer"
    # stride-2 window alignment: "same" (TF) | "torch" (torchvision geometry,
    # required for --pretrained_model state_dicts) — see layers.pad2
    pad_style: str = "same"

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        x = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2),
            padding=pad2(7, self.pad_style),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        x = nn.relu(x)
        feats.append(x)  # relu0: H/2
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pad2(3, self.pad_style))
        feats.append(x)  # pool0: H/4

        if self.remat and self.remat_policy == "block":
            block_remat = nn.remat(_dense_block, static_argnums=(2, 3))

            def run_block(x, layer_ids):
                return block_remat(self, x, train, layer_ids)

        elif self.remat and self.remat_policy == "convs":
            layer_remat = nn.remat(
                _dense_block,
                static_argnums=(2, 3),
                policy=jax.checkpoint_policies.save_only_these_names(
                    "dense_1x1_out", "dense_3x3_out"
                ),
            )

            def run_block(x, layer_ids):
                # per-LAYER remat boundary with the conv-saving policy
                for li in layer_ids:
                    x = layer_remat(self, x, train, (li,))
                return x

        elif self.remat:  # 'layer' (default)
            layer_cls = nn.remat(DenseLayer, static_argnums=(2,))

            def run_block(x, layer_ids):
                for li in layer_ids:
                    x = layer_cls(
                        self.growth_rate, dtype=self.dtype, name=f"DenseLayer_{li}"
                    )(x, train)
                return x

        else:

            def run_block(x, layer_ids):
                return _dense_block(self, x, train, layer_ids)

        ch = self.num_init_features
        li0 = 0
        for i, num_layers in enumerate(self.block_config):
            x = run_block(x, tuple(range(li0, li0 + num_layers)))
            li0 += num_layers
            ch += self.growth_rate * num_layers
            if i != len(self.block_config) - 1:
                ch = ch // 2
                x = Transition(ch, dtype=self.dtype)(x, train)
                if i < 2:
                    feats.append(x)  # transition1: H/8, transition2: H/16
        x = BatchNorm(dtype=self.dtype)(x, train)  # norm5, pre-ReLU
        feats.append(x)  # H/32
        return feats
