"""Fixed-grid Euler–Maruyama SDE integration as a single ``lax.scan``.

TPU-native replacement for the reference's forked torchsde solver
(``models/utils/sdeint.py``): the reference re-validates contracts and
constructs a fresh ``BrownianInterval`` on every call (``sdeint.py:827-995,
983``) and runs a Python ``while`` loop per segment (``sdeint.py:349-381``).
Here the whole trajectory is one compiled scan; Brownian increments come
from a splittable PRNG key folded per step, making paths reproducible
under any data sharding (a capability the reference lacks — its noise is
not reproducible across world sizes).

Semantics reproduced deliberately (SURVEY §2.5):
  * drift = posterior ``f`` only — the OU prior ``h`` participates only in
    the (unshipped) logqp/KL path, so fixed-grid integration uses ``f``;
  * diffusion ``g`` is evaluated at the segment START (Euler), scalar per
    row, and the per-step ``g`` is exposed ("``sdeint_dual``" tap,
    ``sdeint.py:110-197``);
  * ``y1 = y0 + f(t0, y0)·dt + g(t0, y0)·ΔW``, ``ΔW ~ N(0, dt)``
    (``Euler_private.step``, ``sdeint.py:477-485``).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def euler_maruyama(
    f: Callable[[jax.Array, jax.Array], jax.Array],
    g: Callable[[jax.Array, jax.Array], jax.Array],
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Integrate ``dy = f dt + g dW`` on the fixed grid ``ts``.

    Args:
      f, g: callables ``(t_scalar, y) -> drift / diffusion`` (g may be
        scalar-per-row ``[..., 1]`` or full ``[..., D]``; it is broadcast
        against the Brownian increment).
      y0:  initial state ``[..., D]``.
      ts:  1-D time grid ``[T+1]`` (static values; one Euler step per
        segment, matching the reference where segment span == dt).
      key: PRNG key; step ``i`` uses ``fold_in(key, i)``.

    Returns:
      ys: ``[T, ..., D]`` states after each step (excludes ``y0``).
      gs: ``[T, ...]`` per-step diffusion magnitudes (last dim squeezed if
        scalar) — the ``sdeint_dual`` diffusion tap generalized to every
        step (the reference returns only the final step's ``g``,
        ``sdeint.py:384``; callers index what they need).
    """
    t0s = ts[:-1]
    dts = ts[1:] - ts[:-1]
    steps = jnp.arange(t0s.shape[0])

    def body(y, inputs):
        i, t0, dt = inputs
        eps = jax.random.normal(jax.random.fold_in(key, i), y.shape, y.dtype)
        drift = f(t0, y)
        diff = g(t0, y)
        y1 = y + drift * dt + diff * (jnp.sqrt(dt) * eps)
        return y1, (y1, diff)

    _, (ys, gs) = jax.lax.scan(body, y0, (steps, t0s, dts))
    return ys, gs


def euler_maruyama_logqp(
    f: Callable[[jax.Array, jax.Array], jax.Array],
    g: Callable[[jax.Array, jax.Array], jax.Array],
    h: Callable[[jax.Array, jax.Array], jax.Array],
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Latent-SDE integration with the KL (logqp) path penalty.

    Capability analog of the reference's augmented solver
    (``models/utils/sde_utils.py:77-209`` — ``f_aug``/``g_aug``): the state
    is augmented with the running log-ratio between the posterior (drift
    ``f``) and prior (drift ``h``) path measures under shared diffusion
    ``g``:  dKL = ½ ‖(f − h) / g‖² dt.  The reference ships BCE instead of
    this KL loss (SURVEY §2.5) but retains the machinery; here it is a
    first-class option.

    Returns (ys [T, ..., D], kl [...]) — the terminal KL per sample row.
    """
    t0s = ts[:-1]
    dts = ts[1:] - ts[:-1]
    steps = jnp.arange(t0s.shape[0])
    kl0 = jnp.zeros(y0.shape[:-1], y0.dtype)

    def body(carry, inputs):
        y, kl = carry
        i, t0, dt = inputs
        eps = jax.random.normal(jax.random.fold_in(key, i), y.shape, y.dtype)
        drift = f(t0, y)
        diff = g(t0, y)
        u = (drift - h(t0, y)) / jnp.maximum(jnp.abs(diff), 1e-6)
        kl = kl + 0.5 * jnp.sum(u * u, axis=-1) * dt
        y1 = y + drift * dt + diff * (jnp.sqrt(dt) * eps)
        return (y1, kl), y1

    (_, kl), ys = jax.lax.scan(body, (y0, kl0), (steps, t0s, dts))
    return ys, kl


def ou_moments(y0: jax.Array, theta: float, mu: float, sigma: float, t: jax.Array):
    """Analytic mean/var of the Ornstein–Uhlenbeck process (test oracle).

    ``dy = θ(μ − y) dt + σ dW`` ⇒  E[y_t] = μ + (y0 − μ)e^{−θt},
    Var[y_t] = σ²(1 − e^{−2θt}) / (2θ).
    """
    mean = mu + (y0 - mu) * jnp.exp(-theta * t)
    var = sigma**2 * (1.0 - jnp.exp(-2.0 * theta * t)) / (2.0 * theta)
    return mean, var
