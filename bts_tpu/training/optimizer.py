"""Optimizer: AdamW (eps 1e-3) + polynomial LR decay, power 0.9.

Reference contract (SURVEY.md §2.1): Adam with ``adam_eps 1e-3``, optional
weight decay, and polynomial decay

    lr(step) = (lr0 - end_lr) * (1 - step/total_steps)^0.9 + end_lr

with ``end_learning_rate -1`` meaning ``0.1 * lr0``.  Optimizer state is
f32 (params are f32 masters; bf16 lives only in the forward compute dtype).
"""

from __future__ import annotations

import optax


def polynomial_schedule(lr: float, end_lr: float, total_steps: int, power: float = 0.9):
    return optax.polynomial_schedule(
        init_value=lr, end_value=end_lr, power=power, transition_steps=total_steps
    )


def make_optimizer(cfg, total_steps: int) -> optax.GradientTransformation:
    sched = polynomial_schedule(cfg.learning_rate, cfg.end_lr, total_steps)
    return optax.adamw(
        learning_rate=sched,
        b1=0.9,
        b2=0.999,
        eps=cfg.adam_eps,
        weight_decay=cfg.weight_decay,
    )
