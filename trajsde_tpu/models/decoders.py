"""Trajectory decoders: one-shot MLP and latent-SDE rollout.

Dense layouts: ``local_embed [B, A, D]``, ``global_embed [B, F, A, D]``;
outputs ``loc [B, F, A, Tf, 2|4]``, ``pi [B, A, F]``,
``reg_mask [B, A, Tf]`` (the reference's [F, N, H, ·] / [N, F] with an
explicit batch dim).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from trajsde_tpu.data.scene import SceneBatch
from trajsde_tpu.models.layers import LN_EPS, XAVIER
from trajsde_tpu.models.sde import SDEStep, decoder_time_grid, scanned


def _mlp_head(dims, name_prefix: str):
    """Dense→LN→ReLU stacks with a final plain Dense (reference head shape)."""
    layers = []
    for i, d in enumerate(dims[:-1]):
        layers.append(nn.Dense(d, kernel_init=XAVIER, name=f"{name_prefix}_dense{i}"))
        layers.append(nn.LayerNorm(epsilon=LN_EPS, name=f"{name_prefix}_ln{i}"))
    layers.append(
        nn.Dense(dims[-1], kernel_init=XAVIER, name=f"{name_prefix}_dense{len(dims) - 1}")
    )
    return layers


def _apply_head(layers, x):
    n = (len(layers) - 1) // 2
    for i in range(n):
        x = layers[2 * i](x)
        x = layers[2 * i + 1](x)
        x = nn.relu(x)
    return layers[-1](x)


class MLPDecoder(nn.Module):
    """One-shot MLP decoder (``models/decoders/dec_hivt_nusargo_grid.py:10-64``)."""

    local_channels: int
    global_channels: int
    future_steps: int
    num_modes: int
    uncertain: bool = True
    min_scale: float = 1e-3

    @nn.compact
    def __call__(
        self,
        scene: SceneBatch,
        local_embed: jax.Array,
        global_embed: jax.Array,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        D = self.local_channels
        B, F, A = global_embed.shape[:3]
        local_exp = jnp.broadcast_to(local_embed[:, None], global_embed.shape)

        pi_layers = _mlp_head([D, D, 1], "pi")
        pi = _apply_head(pi_layers, jnp.concatenate([local_exp, global_embed], axis=-1))
        pi = jnp.transpose(pi[..., 0], (0, 2, 1))  # [B, A, F]

        h = nn.Dense(D, kernel_init=XAVIER, name="aggr_dense")(
            jnp.concatenate([global_embed, local_exp], axis=-1)
        )
        h = nn.relu(nn.LayerNorm(epsilon=LN_EPS, name="aggr_ln")(h))

        loc_layers = _mlp_head([D, self.future_steps * 2], "loc")
        loc = _apply_head(loc_layers, h).reshape(B, F, A, self.future_steps, 2)

        if self.uncertain:
            scale_layers = _mlp_head([D, self.future_steps * 2], "scale")
            scale = _apply_head(scale_layers, h).reshape(B, F, A, self.future_steps, 2)
            scale = nn.elu(scale) + 1.0 + self.min_scale
            loc = jnp.concatenate([loc, scale], axis=-1)

        Tf = self.future_steps
        return {
            "loc": loc,
            "pi": pi,
            "reg_mask": ~scene.padding_mask[:, :, -Tf:],
        }


class SDEDecoder(nn.Module):
    """Latent-SDE rollout decoder (``models/decoders/dec_hivt_nusargo_sde.py:14-105``).

    The 60-step Euler–Maruyama rollout over ``linspace(0, max_fut_t, Tf+1)``
    runs as a single ``nn.scan`` on the fused ``[B, F, A, D]`` state; each
    step's latent is decoded to a 2-D location (+ scale).
    """

    local_channels: int
    global_channels: int
    future_steps: int
    num_modes: int
    max_fut_t: float = 6.0
    uncertain: bool = True
    min_scale: float = 1e-3
    ode_func_layers: int = 3  # accepted for config parity (unused ODE path)
    sde_layers: int = 2
    min_stepsize: float = 0.1
    method: str = "euler"
    rtol: float = 1e-3
    atol: float = 1e-3

    @nn.compact
    def __call__(
        self,
        scene: SceneBatch,
        local_embed: jax.Array,
        global_embed: jax.Array,
        deterministic: bool = True,
    ) -> Dict[str, jax.Array]:
        D = self.local_channels
        B, F, A = global_embed.shape[:3]
        Tf = self.future_steps
        local_exp = jnp.broadcast_to(local_embed[:, None], global_embed.shape)

        h = nn.Dense(D, kernel_init=XAVIER, name="aggr_dense")(
            jnp.concatenate([global_embed, local_exp], axis=-1)
        )
        y0 = nn.relu(nn.LayerNorm(epsilon=LN_EPS, name="aggr_ln")(h))  # [B, F, A, D]

        t0s, dts = decoder_time_grid(Tf, self.max_fut_t)
        rollout = scanned(SDEStep, "sde_rollout", embed_dim=D, sde_layers=self.sde_layers)
        _, ys = rollout(y0, (t0s, dts))                    # [Tf, B, F, A, D]
        sol = jnp.transpose(ys, (1, 2, 3, 0, 4))           # [B, F, A, Tf, D]

        loc_layers = _mlp_head([D, 2], "decoder")
        loc = _apply_head(loc_layers, sol)                 # [B, F, A, Tf, 2]

        pi_layers = _mlp_head([D, 1], "pi")
        pi = _apply_head(pi_layers, jnp.concatenate([local_exp, global_embed], axis=-1))
        pi = jnp.transpose(pi[..., 0], (0, 2, 1))          # [B, A, F]

        if self.uncertain:
            scale_layers = _mlp_head([D, 2], "scale")
            scale = nn.elu(_apply_head(scale_layers, sol)) + 1.0 + self.min_scale
            loc = jnp.concatenate([loc, scale], axis=-1)

        return {
            "loc": loc,
            "pi": pi,
            "reg_mask": ~scene.padding_mask[:, :, -Tf:],
        }
