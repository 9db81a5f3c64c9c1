"""Optimizer: AdamW (eps 1e-3) + polynomial LR decay, power 0.9.

Reference contract (SURVEY.md §2.1): Adam with ``adam_eps 1e-3``, optional
weight decay, and polynomial decay

    lr(step) = (lr0 - end_lr) * (1 - step/total_steps)^0.9 + end_lr

with ``end_learning_rate -1`` meaning ``0.1 * lr0``.  Optimizer state is
f32 (params are f32 masters; bf16 lives only in the forward compute dtype).
"""

from __future__ import annotations

from typing import Optional

import optax


def polynomial_schedule(lr: float, end_lr: float, total_steps: int, power: float = 0.9):
    return optax.polynomial_schedule(
        init_value=lr, end_value=end_lr, power=power, transition_steps=total_steps
    )


def freeze_mask(params, cfg) -> Optional[dict]:
    """--fix_first_conv_block(s): True where a param is TRAINABLE.

    Freezes the encoder stem + first one/two stages (reference fine-tuning
    flags, SURVEY.md §2.12).  Returns None when nothing is frozen.
    """
    num = 2 if cfg.fix_first_conv_blocks else (1 if cfg.fix_first_conv_block else 0)
    if num == 0:
        return None
    from bts_tpu.models.encoders import freeze_prefixes

    frozen = set(freeze_prefixes(cfg.encoder, num))

    import jax

    def trainable(path, _):
        keys = [getattr(p, "key", str(p)) for p in path]
        # frozen names are submodules of the encoder module (depth 1);
        # the decoder reuses names like Conv_0, so scope to the encoder
        in_encoder = keys and keys[0].split("_")[0] in ("DenseNet", "ResNet", "MobileNetV2")
        return not (in_encoder and len(keys) > 1 and keys[1] in frozen)

    return jax.tree_util.tree_map_with_path(trainable, params)


def make_optimizer(cfg, total_steps: int) -> optax.GradientTransformation:
    sched = polynomial_schedule(cfg.learning_rate, cfg.end_lr, total_steps)
    tx = optax.adamw(
        learning_rate=sched,
        b1=0.9,
        b2=0.999,
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )
    if cfg.fix_first_conv_block or cfg.fix_first_conv_blocks:
        # zero the FINAL update (after adamw) for frozen params, so neither
        # the gradient step nor adamw's decoupled weight decay moves them
        def frozen_sel(params):
            import jax

            mask = freeze_mask(params, cfg)
            return jax.tree.map(lambda trainable: not trainable, mask)

        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_sel))
    return tx
