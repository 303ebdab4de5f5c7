"""Trajectory decoders: one-shot MLP and latent-SDE rollout.

Dense layouts: ``local_embed [B, A, D]``, ``global_embed [B, F, A, D]``;
outputs ``loc [B, F, A, Tf, 2|4]``, ``pi [B, A, F]``,
``reg_mask [B, A, Tf]`` (the reference's [F, N, H, ·] / [N, F] with an
explicit batch dim).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from trajsde_tpu.data.scene import SceneBatch
from trajsde_tpu.models.layers import LN_EPS, XAVIER
from trajsde_tpu.models.sde import (
    FFuncParams,
    GFuncParams,
    SDEStep,
    decoder_time_grid,
    scanned,
)


class _SDEStepParams(nn.Module):
    """Param bank mirroring ``scanned(SDEStep)``'s tree."""

    embed_dim: int
    sde_layers: int = 2

    @nn.compact
    def __call__(self):
        return {
            "f_func": FFuncParams(self.embed_dim, self.sde_layers, name="f_func")(),
            "g_func": GFuncParams(self.embed_dim, self.sde_layers, name="g_func")(),
        }


def _mlp_head(dims, name_prefix=None, dtype=None):
    """Dense→LN→ReLU stacks with a final plain Dense (reference head shape).

    ``name_prefix=None`` for setup-context creation (linen derives names
    from the attribute; explicit names are only legal in compact modules).
    """
    def nm(suffix):
        return {"name": f"{name_prefix}_{suffix}"} if name_prefix else {}

    layers = []
    for i, d in enumerate(dims[:-1]):
        layers.append(nn.Dense(d, kernel_init=XAVIER, dtype=dtype, **nm(f"dense{i}")))
        layers.append(nn.LayerNorm(epsilon=LN_EPS, dtype=dtype, **nm(f"ln{i}")))
    layers.append(
        nn.Dense(dims[-1], kernel_init=XAVIER, dtype=dtype, **nm(f"dense{len(dims) - 1}"))
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
    dtype: Any = None

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

        pi_layers = _mlp_head([D, D, 1], "pi", dtype=self.dtype)
        pi = _apply_head(pi_layers, jnp.concatenate([local_exp, global_embed], axis=-1))
        pi = jnp.transpose(pi[..., 0], (0, 2, 1)).astype(jnp.float32)  # [B, A, F]

        h = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="aggr_dense")(
            jnp.concatenate([global_embed, local_exp], axis=-1)
        )
        h = nn.relu(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="aggr_ln")(h))

        loc_layers = _mlp_head([D, self.future_steps * 2], "loc", dtype=self.dtype)
        loc = _apply_head(loc_layers, h).reshape(B, F, A, self.future_steps, 2)
        loc = loc.astype(jnp.float32)

        if self.uncertain:
            scale_layers = _mlp_head([D, self.future_steps * 2], "scale", dtype=self.dtype)
            scale = _apply_head(scale_layers, h).reshape(B, F, A, self.future_steps, 2)
            scale = nn.elu(scale.astype(jnp.float32)) + 1.0 + self.min_scale
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
    dtype: Any = None
    fused: bool = False       # Pallas VMEM-resident rollout (fwd + custom VJP)
    rollout_rows: int = 1024  # fused rollout row-tile size
    rollout_unroll: int = 6   # fused rollout steps per grid iteration
    scan_unroll: int = 1      # lax.scan unroll for the non-fused rollout
    packed: bool = True       # pack f+g per step into one full-width chain

    def setup(self):
        if self.method != "euler":
            raise NotImplementedError(
                f"SDE method {self.method!r} is not supported (euler only)"
            )
        if self.fused and self.sde_layers != 2:
            raise NotImplementedError(
                "SDEDecoder(fused=True) hardcodes the sde_layers=2 topology "
                "(ops/pallas/sde_rollout.py); use fused=False for other depths"
            )
        D = self.local_channels
        self.aggr_dense = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype)
        self.aggr_ln = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)
        if self.fused:
            # identical parameter tree to the scanned module (same scope name)
            self.sde_rollout_params = _SDEStepParams(
                D, self.sde_layers, name="sde_rollout"
            )
        else:
            self.sde_rollout = scanned(
                SDEStep, None, embed_dim=D, sde_layers=self.sde_layers,
                dtype=self.dtype, unroll=self.scan_unroll, packed=self.packed,
            )
        self.loc_layers = _mlp_head([D, 2], dtype=self.dtype)
        self.pi_layers = _mlp_head([D, 1], dtype=self.dtype)
        if self.uncertain:
            self.scale_layers = _mlp_head([D, 2], dtype=self.dtype)

    def time_grid(self):
        return decoder_time_grid(self.future_steps, self.max_fut_t)

    def fuse(
        self, scene: SceneBatch, local_embed: jax.Array, global_embed: jax.Array
    ) -> jax.Array:
        """Initial rollout state ``y0 [B, F, A, D]`` (``dec_hivt_nusargo_sde.py:82-86``)."""
        local_exp = jnp.broadcast_to(local_embed[:, None], global_embed.shape)
        h = self.aggr_dense(jnp.concatenate([global_embed, local_exp], axis=-1))
        return nn.relu(self.aggr_ln(h))

    def decode(
        self,
        scene: SceneBatch,
        sol: jax.Array,
        local_embed: jax.Array,
        global_embed: jax.Array,
    ) -> Dict[str, jax.Array]:
        """Per-step latents ``sol [B, F, A, Tf, D]`` → output dict."""
        Tf = self.future_steps
        local_exp = jnp.broadcast_to(local_embed[:, None], global_embed.shape)
        loc = _apply_head(self.loc_layers, sol).astype(jnp.float32)  # [B, F, A, Tf, 2]
        pi = _apply_head(
            self.pi_layers, jnp.concatenate([local_exp, global_embed], axis=-1)
        )
        pi = jnp.transpose(pi[..., 0], (0, 2, 1)).astype(jnp.float32)  # [B, A, F]
        if self.uncertain:
            scale = (
                nn.elu(_apply_head(self.scale_layers, sol).astype(jnp.float32))
                + 1.0
                + self.min_scale
            )
            loc = jnp.concatenate([loc, scale], axis=-1)
        return {
            "loc": loc,
            "pi": pi,
            "reg_mask": ~scene.padding_mask[:, :, -Tf:],
        }

    def __call__(
        self,
        scene: SceneBatch,
        local_embed: jax.Array,
        global_embed: jax.Array,
        deterministic: bool = True,
        sde_noise=None,
    ) -> Dict[str, jax.Array]:
        """``sde_noise`` [Tf, B, F, A, D] optionally pins the per-step
        Brownian unit normals (gradient-parity harness; scan path only)."""
        y0 = self.fuse(scene, local_embed, global_embed)
        t0s, dts = self.time_grid()
        if self.fused:
            if sde_noise is not None:
                raise NotImplementedError(
                    "explicit sde_noise requires the scan rollout (fused=False)"
                )
            ys = self._fused_rollout(y0, t0s, dts)         # [Tf, B, F, A, D]
        else:
            xs = (t0s, dts) if sde_noise is None else (t0s, dts, sde_noise)
            _, ys = self.sde_rollout(y0, xs)               # [Tf, B, F, A, D]
        sol = jnp.transpose(ys, (1, 2, 3, 0, 4))           # [B, F, A, Tf, D]
        return self.decode(scene, sol, local_embed, global_embed)

    def _fused_rollout(self, y0: jax.Array, t0s, dts) -> jax.Array:
        """Training rollout through the Pallas kernel (custom VJP): the
        whole 60-step chain stays VMEM-resident both ways — no per-step MLP
        residuals in HBM.  Same parameters as the scan path; the Brownian
        stream differs (on-core per-(tile, step) PRNG vs per-step fold_in),
        which is immaterial — both are exact Euler–Maruyama draws."""
        from trajsde_tpu.ops.pallas.sde_rollout import (
            rollout_params_from_linen, sde_rollout_train,
        )

        Tf = self.future_steps
        B, F, A, D = y0.shape
        kp = rollout_params_from_linen(self.sde_rollout_params())
        key = self.make_rng("sde")
        interpret = jax.default_backend() != "tpu"
        if interpret:  # CPU interpreter lacks the on-core PRNG primitives
            seed = jnp.int32(0)
            noise = jax.random.normal(key, (Tf, B * F * A, D), jnp.float32)
        else:
            seed = jax.random.randint(key, (), 0, jnp.iinfo(jnp.int32).max)
            noise = None
        ys = sde_rollout_train(
            y0.reshape(-1, D).astype(jnp.float32), kp, t0s, dts, seed,
            num_steps=Tf, block_rows=self.rollout_rows, interpret=interpret,
            noise=noise, unroll=self.rollout_unroll,
        )
        return ys.reshape(Tf, B, F, A, D).astype(y0.dtype)
