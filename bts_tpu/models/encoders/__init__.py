"""Backbone registry (reference ``--encoder`` flag, SURVEY.md §2.5).

Each encoder is a linen module returning a list of 5 NHWC feature maps at
strides [2, 4, 8, 16, 32]; the last entry is the pre-activation bottleneck
(the decoder applies ReLU, matching the reference lineage).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from bts_tpu.models.encoders.densenet import DenseNet
from bts_tpu.models.encoders.mobilenetv2 import MobileNetV2
from bts_tpu.models.encoders.resnet import ResNet

# name -> (constructor kwargs, feature channels at strides 2/4/8/16/32)
ENCODERS = {
    "densenet121_bts": dict(
        cls=DenseNet,
        kwargs=dict(growth_rate=32, block_config=(6, 12, 24, 16), num_init_features=64),
        channels=(64, 64, 128, 256, 1024),
    ),
    "densenet161_bts": dict(
        cls=DenseNet,
        kwargs=dict(growth_rate=48, block_config=(6, 12, 36, 24), num_init_features=96),
        channels=(96, 96, 192, 384, 2208),
    ),
    "resnet50_bts": dict(
        cls=ResNet,
        kwargs=dict(stage_sizes=(3, 4, 6, 3)),
        channels=(64, 256, 512, 1024, 2048),
    ),
    "resnet101_bts": dict(
        cls=ResNet,
        kwargs=dict(stage_sizes=(3, 4, 23, 3)),
        channels=(64, 256, 512, 1024, 2048),
    ),
    "resnext50_bts": dict(
        cls=ResNet,
        kwargs=dict(stage_sizes=(3, 4, 6, 3), groups=32, width_per_group=4),
        channels=(64, 256, 512, 1024, 2048),
    ),
    "resnext101_bts": dict(
        cls=ResNet,
        kwargs=dict(stage_sizes=(3, 4, 23, 3), groups=32, width_per_group=8),
        channels=(64, 256, 512, 1024, 2048),
    ),
    "mobilenetv2_bts": dict(
        cls=MobileNetV2,
        kwargs=dict(),
        channels=(16, 24, 32, 96, 1280),
    ),
}


def freeze_prefixes(name: str, num_blocks: int) -> Tuple[str, ...]:
    """Encoder submodule names frozen by --fix_first_conv_block(s).

    Reference semantics (SURVEY.md §2.12 ``fix_first_conv_block[s]``): freeze
    the stem plus the first one (``_block``) or two (``_blocks``) stages when
    fine-tuning.  Returns flax submodule-name prefixes within the encoder.
    """
    spec = ENCODERS[name]
    names = ["Conv_0", "BatchNorm_0"]  # stem
    cls = spec["cls"].__name__
    if cls == "DenseNet":
        cfg = spec["kwargs"]["block_config"]
        li = 0
        for stage in range(min(num_blocks, len(cfg))):
            names += [f"DenseLayer_{li + j}" for j in range(cfg[stage])]
            li += cfg[stage]
            if stage < len(cfg) - 1:
                names.append(f"Transition_{stage}")
    elif cls == "ResNet":
        sizes = spec["kwargs"]["stage_sizes"]
        bi = 0
        for stage in range(min(num_blocks, len(sizes))):
            names += [f"Bottleneck_{bi + j}" for j in range(sizes[stage])]
            bi += sizes[stage]
    elif cls == "MobileNetV2":
        # MBV2 config rows: stage1 = the single 16ch block, stage2 = the
        # two 24ch blocks (InvertedResidual counter is global)
        stage_blocks = ((0,), (1, 2))
        for stage in range(min(num_blocks, 2)):
            names += [f"InvertedResidual_{j}" for j in stage_blocks[stage]]
    return tuple(names)


def build_encoder(
    name: str,
    dtype=jnp.float32,
    remat: bool = False,
    remat_policy: str = "layer",
    pad_style: str = "same",
):
    if name not in ENCODERS:
        raise ValueError(f"unknown encoder {name!r}; choose from {sorted(ENCODERS)}")
    spec = ENCODERS[name]
    kwargs = dict(spec["kwargs"])
    if spec["cls"] is DenseNet:
        # remat granularity is a DenseNet knob (measured sweep,
        # PERFORMANCE.md); other encoders checkpoint per stage block
        kwargs["remat_policy"] = remat_policy
    return spec["cls"](dtype=dtype, remat=remat, pad_style=pad_style, **kwargs)


def encoder_channels(name: str) -> Tuple[int, ...]:
    return ENCODERS[name]["channels"]
