"""Latent-SDE drift/diffusion networks and scan step modules.

Reference semantics (``models/encoders/enc_hivt_nusargo_sde_sep2.py:372-496``
and ``models/decoders/dec_hivt_nusargo_sde.py:107-195``):

* ``FFunc`` (posterior drift): MLP on ``[y, sin t, cos t]`` —
  ``Linear(D+2→D)`` followed by ``num_layers`` × ``(tanh, Linear(D→D))``.
* ``GFunc`` (diffusion): ``Linear(D+2→D)``, ``(num_layers−1)`` ×
  ``(tanh, Linear(D→D))``, then ``tanh, Linear(D→1)``, ``sigmoid`` —
  a scalar magnitude per row, broadcast across the latent dim
  (diagonal noise with equal entries, ``:480-481``).
* ``HFunc`` (OU prior drift, frozen): ``θ(μ − y)`` — present for the
  latent-KL (logqp) capability; NOT used by fixed-grid integration
  (the shipped loss is the diffusion BCE instead, SURVEY §2.5).
* Dual-domain routing: two independent ``GFunc``s selected per row by the
  nuScenes mask (``LSDEFunc.g``, ``:470-482``).

Brownian increments are drawn inside the step modules via
``self.make_rng('sde')``; under ``nn.scan`` with ``split_rngs={'sde': True}``
every step gets an independent, reproducible stream.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from trajsde_tpu.models.layers import XAVIER, GRUUnit, ParamDense, packed_mlp_eval


class FFuncParams(nn.Module):
    """Param bank mirroring ``FFunc``'s tree (packed compute path)."""

    embed_dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self):
        D = self.embed_dim
        out = {"dense0": ParamDense(D + 2, D, name="dense0")()}
        for i in range(self.num_layers):
            out[f"dense{i + 1}"] = ParamDense(D, D, name=f"dense{i + 1}")()
        return out


class GFuncParams(nn.Module):
    """Param bank mirroring ``GFunc``'s tree (packed compute path)."""

    embed_dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self):
        D = self.embed_dim
        out = {"dense0": ParamDense(D + 2, D, name="dense0")()}
        for i in range(self.num_layers - 1):
            out[f"dense{i + 1}"] = ParamDense(D, D, name=f"dense{i + 1}")()
        out["dense_out"] = ParamDense(D, 1, name="dense_out")()
        return out


def _f_layer_list(p, num_layers):
    return [p["dense0"]] + [p[f"dense{i + 1}"] for i in range(num_layers)]


def _g_layer_list(p, num_layers):
    return (
        [p["dense0"]]
        + [p[f"dense{i + 1}"] for i in range(num_layers - 1)]
        + [p["dense_out"]]
    )


def _time_feats(t: jax.Array, y: jax.Array) -> jax.Array:
    """Concatenate ``[y, sin t, cos t]`` with ``t`` broadcast per row."""
    shape = y.shape[:-1] + (1,)
    ts = jnp.broadcast_to(jnp.sin(t), shape).astype(y.dtype)
    tc = jnp.broadcast_to(jnp.cos(t), shape).astype(y.dtype)
    return jnp.concatenate([y, ts, tc], axis=-1)


class FFunc(nn.Module):
    """Posterior drift MLP (``enc_hivt_nusargo_sde_sep2.py:372-398``)."""

    embed_dim: int
    num_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, t: jax.Array, y: jax.Array) -> jax.Array:
        h = nn.Dense(self.embed_dim, kernel_init=XAVIER, dtype=self.dtype, name="dense0")(_time_feats(t, y))
        for i in range(self.num_layers):
            h = nn.tanh(h)
            h = nn.Dense(self.embed_dim, kernel_init=XAVIER, dtype=self.dtype, name=f"dense{i + 1}")(h)
        return h


class GFunc(nn.Module):
    """Diffusion magnitude MLP → scalar sigmoid (``:412-440``)."""

    embed_dim: int
    num_layers: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, t: jax.Array, y: jax.Array) -> jax.Array:
        h = nn.Dense(self.embed_dim, kernel_init=XAVIER, dtype=self.dtype, name="dense0")(_time_feats(t, y))
        for i in range(self.num_layers - 1):
            h = nn.tanh(h)
            h = nn.Dense(self.embed_dim, kernel_init=XAVIER, dtype=self.dtype, name=f"dense{i + 1}")(h)
        h = nn.tanh(h)
        h = nn.Dense(1, kernel_init=XAVIER, dtype=self.dtype, name="dense_out")(h)
        return nn.sigmoid(h)  # [..., 1]


def h_prior(t: jax.Array, y: jax.Array, theta: float = 1.0, mu: float = 0.0) -> jax.Array:
    """Frozen OU prior drift ``θ(μ − y)`` (``HFunc``, ``:401-409``)."""
    return theta * (mu - y)


class SDEGRUStep(nn.Module):
    """One ODE-RNN step: Euler–Maruyama segment + masked GRU fusion.

    Carry: latent state ``h [..., D]``.
    Per-step inputs ``xs = (obs, obs_mask, t0, dt[, eps])``:
      obs      [..., D]  precomputed AA observation for this time step
      obs_mask [...]     bool — actor observed at this step
      t0, dt   scalars   segment start / length (first segment dt=0.01,
                         rest 0.1 — ``enc_hivt_nusargo_sde_sep2.py:128-150``)
      eps      [..., D]  optional explicit Brownian draw (unit normal);
                         when present the step consumes it instead of
                         ``make_rng('sde')`` — used by the gradient-parity
                         harness to match noise with the torch reference
    Emits ``(h_next, (h_next, g_scalar))`` where ``g_scalar [...,]`` is the
    diffusion magnitude tap used by the BCE discrimination head
    (``sdeint_dual``'s returned ``g``, ``sdeint.py:195-197``).

    ``nus_mask [...]`` routes rows to the nuScenes vs Argoverse diffusion
    net (dense formulation computes both tiny MLPs and selects — identical
    math to the reference's subset routing, ``:470-482``).
    """

    embed_dim: int
    sde_layers: int = 2
    dtype: Any = None
    # adaptive step-doubling within each observation segment (the
    # reference's ``adaptive: true`` branch, ``sdeint.py:349-381`` —
    # broken there for the dual path; implemented here via the bounded
    # differentiable controller in :func:`ops.sdeint.sdeint_adaptive`)
    adaptive: bool = False
    rtol: float = 1e-3
    atol: float = 1e-3
    adaptive_max_steps: int = 8
    packed: bool = True  # f + g_nus + g_argo share [y, sin t, cos t]: pack
                         # the three 64-wide MLPs into one full-width chain
                         # (identical params and math; fixed-grid path only)

    def _eps(self, xs, h):
        if len(xs) > 4:
            return xs[4].astype(h.dtype)
        return jax.random.normal(self.make_rng("sde"), h.shape, h.dtype)

    @nn.compact
    def __call__(self, carry, xs):
        h, nus_mask = carry
        obs, obs_mask, t0, dt = xs[:4]
        dt = dt.astype(h.dtype)

        if self.packed and not self.adaptive:
            fp = FFuncParams(self.embed_dim, self.sde_layers, name="f_func")()
            gnp = GFuncParams(self.embed_dim, self.sde_layers, name="g_nus")()
            gap = GFuncParams(self.embed_dim, self.sde_layers, name="g_argo")()
            f, g_nus_raw, g_argo_raw = packed_mlp_eval(
                [
                    _f_layer_list(fp, self.sde_layers),
                    _g_layer_list(gnp, self.sde_layers),
                    _g_layer_list(gap, self.sde_layers),
                ],
                _time_feats(t0, h),
                dtype=self.dtype,
            )
            g = jnp.where(
                nus_mask[..., None], nn.sigmoid(g_nus_raw), nn.sigmoid(g_argo_raw)
            )  # [..., 1]
            eps = self._eps(xs, h)
            y1 = h + f * dt + g * (jnp.sqrt(dt) * eps)
            h_next = GRUUnit(
                self.embed_dim, self.embed_dim, dtype=self.dtype,
                packed=self.packed, name="gru",
            )(y1, obs, obs_mask)
            return (h_next, nus_mask), (h_next, g[..., 0])

        f_mod = FFunc(self.embed_dim, self.sde_layers, dtype=self.dtype, name="f_func")
        g_nus_mod = GFunc(self.embed_dim, self.sde_layers, dtype=self.dtype, name="g_nus")
        g_argo_mod = GFunc(self.embed_dim, self.sde_layers, dtype=self.dtype, name="g_argo")

        def g_fn(t, y):
            return jnp.where(
                nus_mask[..., None], g_nus_mod(t, y), g_argo_mod(t, y)
            )  # [..., 1]

        if self.adaptive:
            if len(xs) > 4:
                raise NotImplementedError(
                    "explicit sde_noise requires the fixed-grid path "
                    "(adaptive=False); the adaptive branch draws from its "
                    "own BrownianTree"
                )
            from trajsde_tpu.ops.sdeint import sdeint_adaptive

            ts = jnp.stack([t0.astype(jnp.float32), (t0 + dt).astype(jnp.float32)])
            ys_seg, _stats = sdeint_adaptive(
                f_mod, g_fn, h, ts, self.make_rng("sde"),
                dt0=dt / 2.0,
                rtol=self.rtol,
                atol=self.atol,
                dt_min=dt / 64.0,
                max_steps=self.adaptive_max_steps,
                depth=8,
                unroll=True,  # linen modules cannot run inside lax loops
            )
            y1 = ys_seg[-1].astype(h.dtype)
            # diffusion tap at the segment END state (the fixed-grid path
            # taps the start — the single Euler step's g; with multiple
            # inner steps the end state is the defined tap point)
            g = g_fn(t0 + dt, y1)
        else:
            f = f_mod(t0, h)
            g = g_fn(t0, h)
            eps = self._eps(xs, h)
            y1 = h + f * dt + g * (jnp.sqrt(dt) * eps)

        h_next = GRUUnit(
            self.embed_dim, self.embed_dim, dtype=self.dtype,
            packed=self.packed, name="gru",
        )(y1, obs, obs_mask)
        return (h_next, nus_mask), (h_next, g[..., 0])


class SDEStep(nn.Module):
    """One plain Euler–Maruyama step (decoder rollout; single diffusion net).

    Carry: ``y [..., D]``; inputs ``(t0, dt[, eps])``; emits ``(y1, y1)``.
    ``eps`` is an optional explicit unit-normal Brownian draw (see
    :class:`SDEGRUStep`).  Matches the decoder's fixed-grid ``sdeint`` over
    ``linspace(0, max_fut_t, future_steps+1)`` with one Euler step per
    segment (``dec_hivt_nusargo_sde.py:72,88``).
    """

    embed_dim: int
    sde_layers: int = 2
    dtype: Any = None
    packed: bool = True  # f + g share the input: one full-width matmul chain

    @nn.compact
    def __call__(self, y, xs):
        t0, dt = xs[:2]
        dt = dt.astype(y.dtype)
        if self.packed:
            fp = FFuncParams(self.embed_dim, self.sde_layers, name="f_func")()
            gp = GFuncParams(self.embed_dim, self.sde_layers, name="g_func")()
            f, g_raw = packed_mlp_eval(
                [
                    _f_layer_list(fp, self.sde_layers),
                    _g_layer_list(gp, self.sde_layers),
                ],
                _time_feats(t0, y),
                dtype=self.dtype,
            )
            g = nn.sigmoid(g_raw)
        else:
            f = FFunc(self.embed_dim, self.sde_layers, dtype=self.dtype, name="f_func")(t0, y)
            g = GFunc(self.embed_dim, self.sde_layers, dtype=self.dtype, name="g_func")(t0, y)
        if len(xs) > 2:
            eps = xs[2].astype(y.dtype)
        else:
            eps = jax.random.normal(self.make_rng("sde"), y.shape, y.dtype)
        y1 = y + f * dt + g * (jnp.sqrt(dt) * eps)
        return y1, y1


def scanned(step_cls, name=None, unroll=1, **kwargs):
    """Wrap a step module in ``nn.scan`` with shared params + split sde rngs.

    ``name=None`` for setup-context creation (the attribute provides the
    name); pass an explicit name only from compact modules.  ``unroll``
    forwards to ``lax.scan`` — >1 trades compile time/code size for
    cross-step XLA fusion of the tiny per-step MLPs.
    """
    scan = nn.scan(
        step_cls,
        variable_broadcast="params",
        split_rngs={"sde": True, "params": False},
        in_axes=0,
        out_axes=0,
        unroll=unroll,
    )
    if name is None:
        return scan(**kwargs)
    return scan(name=name, **kwargs)


def encoder_time_grid(historical_steps: int, max_past_t: float, minimum_step: float):
    """(t0s, dts) for the backwards ODE-RNN, iteration-ordered.

    Reproduces ``enc_hivt_nusargo_sde_sep2.py:128-135,175-179``: pseudo-times
    ``-linspace(-max_past_t, 0, Th)`` consumed newest→oldest; the first
    segment is ``[pts[0]−0.01, pts[0]]`` = ``[-0.01, 0]`` at the NEWEST
    step (dt=0.01), then one segment per remaining historical step.
    """
    pts = -jnp.linspace(-max_past_t, 0.0, historical_steps)[::-1]  # [0, .1, ..., 2]
    t0s = jnp.concatenate([jnp.array([-0.01]), pts[:-1]])
    t1s = jnp.concatenate([jnp.array([0.0]), pts[1:]])
    return t0s, t1s - t0s


def decoder_time_grid(future_steps: int, max_fut_t: float):
    """(t0s, dts) for the future rollout: ``linspace(0, max_fut_t, Tf+1)``."""
    ts = jnp.linspace(0.0, max_fut_t, future_steps + 1)
    return ts[:-1], ts[1:] - ts[:-1]
