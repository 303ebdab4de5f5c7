"""Optimizer / LR-schedule construction.

Reference recipes (``models/model_base_mix_sde.py:204-207``,
``model_base_mix.py:206-209``, configs): AdamW with weight decay, cosine
annealing to 0 over ``T_max`` epochs (the baseline config's StepLR path
references undefined attributes in the reference and is unreachable —
SURVEY §2.2 warts — so cosine is the supported schedule here too).
"""
from __future__ import annotations

import optax


def decay_mask(params) -> dict:
    """HiVT-style weight-decay mask: no decay on biases, LayerNorm
    scales/biases, token/embedding parameters, or the GRU gates.

    The reference configs carry ``hivt_optimizer: true`` / ``nodecay``
    flags that its model bases store but never branch on
    (``model_base_mix.py:206-209``, SURVEY §2.2 warts); this implements
    the behavior those flags name.
    """
    import jax

    NO_DECAY_LEAVES = ("bias",)
    NO_DECAY_SCOPES = (
        "norm", "ln", "bos_token", "cls_token", "padding_token",
        "pos_embed", "hidden", "gru",
    )

    def keep_decay(path) -> bool:
        keys = [str(getattr(k, "key", k)).lower() for k in path]
        if keys[-1] in NO_DECAY_LEAVES:
            return False
        return not any(s in k for k in keys for s in NO_DECAY_SCOPES)

    return jax.tree_util.tree_map_with_path(lambda p, _: keep_decay(p), params)


def cosine_adamw(
    lr: float,
    weight_decay: float,
    t_max_epochs: int,
    steps_per_epoch: int,
    eta_min: float = 0.0,
    nodecay: bool = False,
) -> optax.GradientTransformation:
    """AdamW + per-step cosine annealing (torch steps per epoch; the
    per-step continuous schedule is the same curve sampled finer).
    ``nodecay=True`` applies :func:`decay_mask` (biases/norms/tokens
    excluded from weight decay)."""
    schedule = optax.cosine_decay_schedule(
        init_value=lr,
        decay_steps=max(1, t_max_epochs * steps_per_epoch),
        alpha=eta_min / lr if lr else 0.0,
    )
    return optax.adamw(
        learning_rate=schedule,
        weight_decay=weight_decay,
        mask=decay_mask if nodecay else None,
    )


def build_optimizer(training_cfg: dict, steps_per_epoch: int) -> optax.GradientTransformation:
    return cosine_adamw(
        lr=training_cfg.get("lr", 1e-3),
        weight_decay=training_cfg.get("weight_decay", 0.0),
        t_max_epochs=training_cfg.get("T_max", training_cfg.get("max_epochs", 100)),
        steps_per_epoch=steps_per_epoch,
        nodecay=bool(training_cfg.get("nodecay", False)),
    )
