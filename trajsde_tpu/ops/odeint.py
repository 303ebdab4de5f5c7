"""Fixed-grid ODE integration + dataset time grids.

Capability analog of the reference's latent-ODE helpers
(``models/utils/ode_utils.py``): the ``DiffeqSolver``-over-``torchdiffeq``
Euler path becomes a ``lax.scan`` (``odeint_euler``), and
``get_timesteps`` reproduces the per-dataset observation grids
(``ode_utils.py:197-209``).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def odeint_euler(
    f: Callable[[jax.Array, jax.Array], jax.Array],
    y0: jax.Array,
    ts: jax.Array,
) -> jax.Array:
    """Explicit Euler over a fixed grid: returns states at ``ts[1:]``."""
    t0s = ts[:-1]
    dts = ts[1:] - ts[:-1]

    def body(y, inputs):
        t0, dt = inputs
        y1 = y + f(t0, y) * dt
        return y1, y1

    _, ys = jax.lax.scan(body, y0, (t0s, dts))
    return ys


def odeint_rk4(
    f: Callable[[jax.Array, jax.Array], jax.Array],
    y0: jax.Array,
    ts: jax.Array,
) -> jax.Array:
    """Classic RK4 over a fixed grid (higher-order option the reference's
    config surface exposes via ``method`` but never ships)."""
    t0s = ts[:-1]
    dts = ts[1:] - ts[:-1]

    def body(y, inputs):
        t0, dt = inputs
        k1 = f(t0, y)
        k2 = f(t0 + dt / 2, y + dt * k1 / 2)
        k3 = f(t0 + dt / 2, y + dt * k2 / 2)
        k4 = f(t0 + dt, y + dt * k3)
        y1 = y + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6
        return y1, y1

    _, ys = jax.lax.scan(body, y0, (t0s, dts))
    return ys


def get_timesteps(dataset: str) -> jax.Array:
    """Per-dataset observation time grids (``ode_utils.py:197-209``):
    Argoverse ref step 19 @ 10 Hz over [−2, 3] s; nuScenes ref step 4
    @ 2 Hz over [−2, 6] s; the reference step is pinned to exactly 0."""
    if dataset == "Argoverse":
        ref_step, past_t, future_t, res = 19, 2, 3, 10
    elif dataset == "nuScenes":
        ref_step, past_t, future_t, res = 4, 2, 6, 2
    else:
        raise ValueError(dataset)
    # Reference quirk reproduced deliberately (do not "fix"): the +1/res
    # shift matches Argoverse (ref step 19 lands on 0 naturally) but NOT
    # nuScenes, where index 3 is already 0.0 and pinning index 4 yields a
    # duplicated 0.0 (a zero-length integration segment) and a 1.0 s jump
    # to the next knot — ``ode_utils.py:207-208`` computes exactly this
    # grid, and the trained reference weights bake it in.
    ts = jnp.arange(0, past_t + future_t, 1.0 / res) - past_t + 1.0 / res
    return ts.at[ref_step].set(0.0)
