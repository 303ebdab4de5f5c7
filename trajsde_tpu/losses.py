"""Training losses (reference: ``losses/L2.py``, ``losses/diff_BCE.py``,
``losses/laplace_nll_loss.py``) as pure, jittable functions over the dense
output dict:

  loc      [B, F, A, Tf, 2|4]   (2 loc dims [+ 2 scale dims])
  y        [B, A, Tf, 2]        targets rotated into agent frames
  reg_mask [B, A, Tf] bool
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _best_mode_l2(loc: jax.Array, y: jax.Array, reg_mask: jax.Array):
    """Winner-take-all mode selection by masked mean ADE.

    Matches ``losses/L2.py:17-19``: per-mode L2 zeroed at invalid steps,
    best mode = argmin of the (masked-sum) ADE per actor.
    Returns (l2 [B, F, A, Tf], best [B, A]).
    """
    l2 = jnp.linalg.norm(y[:, None] - loc[..., :2], axis=-1)  # [B, F, A, Tf]
    ade = jnp.sum(l2 * reg_mask[:, None], axis=-1)            # [B, F, A]
    best = jnp.argmin(ade, axis=1)                            # [B, A]
    return l2, best


def l2_loss(scene_y: jax.Array, output: Dict[str, jax.Array]) -> jax.Array:
    """WTA regression loss (``losses/L2.py:5-27``): mean best-mode L2 over
    valid (actor, step) cells; 0 if the mask is empty."""
    loc, reg_mask = output["loc"], output["reg_mask"]
    l2, best = _best_mode_l2(loc, scene_y, reg_mask)
    minl2 = jnp.take_along_axis(l2, best[:, None, :, None], axis=1)[:, 0]  # [B, A, Tf]
    m = reg_mask.astype(minl2.dtype)
    denom = jnp.sum(m)
    return jnp.sum(minl2 * m) / jnp.maximum(denom, 1.0)


def diff_bce_loss(scene_y: jax.Array, output: Dict[str, jax.Array]) -> jax.Array:
    """Diffusion-magnitude discrimination loss (``losses/diff_BCE.py:6-16``):
    ``BCE(diff_in, 0) + BCE(diff_out, 1)`` on the encoder's per-agent
    real/perturbed diffusion taps (sigmoid outputs in (0, 1))."""
    p_in = jnp.clip(output["diff_in"], _EPS, 1.0 - _EPS)
    p_out = jnp.clip(output["diff_out"], _EPS, 1.0 - _EPS)
    label_in, label_out = output["label_in"], output["label_out"]
    loss_in = -(label_in * jnp.log(p_in) + (1.0 - label_in) * jnp.log(1.0 - p_in))
    loss_out = -(label_out * jnp.log(p_out) + (1.0 - label_out) * jnp.log(1.0 - p_out))
    return jnp.mean(loss_in) + jnp.mean(loss_out)


def laplace_nll_loss(scene_y: jax.Array, output: Dict[str, jax.Array]) -> jax.Array:
    """Best-mode Laplace NLL using the scale channel
    (``losses/laplace_nll_loss.py:18-47``; present in the reference but
    referenced by no shipped config)."""
    loc_scale, reg_mask = output["loc"], output["reg_mask"]
    if loc_scale.shape[-1] < 4:
        raise ValueError(
            "LaplaceNLLLoss needs a 4-channel head (2 loc + 2 scale); the "
            f"decoder emits {loc_scale.shape[-1]} channels — use a decoder "
            "with min_scale/scale output or a different loss"
        )
    loc, scale = loc_scale[..., :2], loc_scale[..., 2:]
    l2, best = _best_mode_l2(loc, scene_y, reg_mask)
    bidx = best[:, None, :, None, None]
    loc_b = jnp.take_along_axis(loc, bidx, axis=1)[:, 0]      # [B, A, Tf, 2]
    scale_b = jnp.take_along_axis(scale, bidx, axis=1)[:, 0]
    scale_b = jnp.maximum(scale_b, _EPS)
    nll = jnp.log(2.0 * scale_b) + jnp.abs(scene_y - loc_b) / scale_b
    m = reg_mask[..., None].astype(nll.dtype)
    # reference reduction is ``nll[reg_mask].mean()`` — a mean over
    # count × 2 coordinate channels (``laplace_nll_loss.py:44-45``); the
    # denominator must count the broadcast channels too
    denom = jnp.sum(m) * nll.shape[-1]
    return jnp.sum(nll * m) / jnp.maximum(denom, 1.0)


LOSS_REGISTRY = {
    "L2": l2_loss,
    "DiffBCE": diff_bce_loss,
    "LaplaceNLLLoss": laplace_nll_loss,
}
