"""Optimizer / LR-schedule construction.

Reference recipes (``models/model_base_mix_sde.py:204-207``,
``model_base_mix.py:206-209``, configs): AdamW with weight decay, cosine
annealing to 0 over ``T_max`` epochs (the baseline config's StepLR path
references undefined attributes in the reference and is unreachable —
SURVEY §2.2 warts — so cosine is the supported schedule here too).
"""
from __future__ import annotations

import optax


def cosine_adamw(
    lr: float,
    weight_decay: float,
    t_max_epochs: int,
    steps_per_epoch: int,
    eta_min: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW + per-step cosine annealing (torch steps per epoch; the
    per-step continuous schedule is the same curve sampled finer)."""
    schedule = optax.cosine_decay_schedule(
        init_value=lr,
        decay_steps=max(1, t_max_epochs * steps_per_epoch),
        alpha=eta_min / lr if lr else 0.0,
    )
    return optax.adamw(learning_rate=schedule, weight_decay=weight_decay)


def build_optimizer(training_cfg: dict, steps_per_epoch: int) -> optax.GradientTransformation:
    return cosine_adamw(
        lr=training_cfg.get("lr", 1e-3),
        weight_decay=training_cfg.get("weight_decay", 0.0),
        t_max_epochs=training_cfg.get("T_max", training_cfg.get("max_epochs", 100)),
        steps_per_epoch=steps_per_epoch,
    )
