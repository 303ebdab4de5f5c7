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

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from trajsde_tpu.ops.brownian import BrownianTree


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
      gs: per-step diffusion outputs stacked exactly as ``g`` returns them
        (``[T, ..., 1]`` for scalar-per-row g, ``[T, ..., D]`` otherwise) —
        the ``sdeint_dual`` diffusion tap generalized to every step (the
        reference returns only the final step's ``g``, ``sdeint.py:384``;
        callers index what they need).
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


def sdeint_adaptive(
    f: Callable[[jax.Array, jax.Array], jax.Array],
    g: Callable[[jax.Array, jax.Array], jax.Array],
    y0: jax.Array,
    ts: jax.Array,
    key: jax.Array,
    *,
    dt0: float,
    rtol: float = 1e-3,
    atol: float = 1e-3,
    dt_min: float = 1e-4,
    max_steps: int = 128,
    depth: int = 12,
    safety: float = 0.9,
    min_factor: float = 0.2,
    max_factor: float = 1.4,
    unroll: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Adaptive Euler–Maruyama with step-doubling error control.

    TPU-native analog of the reference's adaptive branch
    (``models/utils/sdeint.py:349-381``: one full step vs two half steps,
    rtol/atol-weighted RMS error, accept iff error ≤ 1 or the step floor is
    hit, linear interpolation onto the output grid).  Differences forced by
    the hardware/compilation model:

    * the data-dependent ``while`` loop becomes a **bounded masked loop**
      (``max_steps`` trip count, rejected/finished iterations are no-ops),
      so the op stays reverse-differentiable (``lax.while_loop`` is not)
      and compiles to a static schedule;
    * the noise source is the counter-based :class:`BrownianTree` instead
      of torchsde's stateful C++ ``BrownianInterval`` — path-consistent
      across the full/half-step split, reproducible under sharding;
    * the step controller is shared by the whole batch (the reference's
      error is also a single scalar across the batch);
    * the error estimate and controller state are ``stop_gradient``-ed,
      matching the reference's ``torch.no_grad()`` block.

    Returns:
      ys: ``[T, ..., D]`` states interpolated at ``ts[1:]``.
      stats: dict with ``n_accepted``, ``n_rejected``, ``final_dt`` and
        ``converged`` (False ⇒ ``max_steps`` was exhausted before
        ``ts[-1]``; outputs past the last reached time hold the final
        state) — the NFE-style observability counters (SURVEY §5).
    """
    ts = jnp.asarray(ts, jnp.float32)
    t_start, t_end = ts[0], ts[-1]
    out_ts = ts[1:]
    T = out_ts.shape[0]
    tree = BrownianTree(key, ts[0], ts[-1], y0.shape, jnp.float32, depth=depth)
    # the tree quantizes queries to the 2**depth leaf grid: a half-step
    # shorter than one leaf would silently produce a zero Brownian
    # increment, so the step floor is clamped to two leaf widths
    # (half-step ≥ leaf resolution)
    dt_min = jnp.maximum(
        jnp.asarray(dt_min, jnp.float32), 2.0 * (t_end - t_start) / (2 ** depth)
    )
    # step-doubling Euler is order-1 deterministically; PI controller in
    # Söderlind form: factor = safety · err^{-(kI+kP)} · prev_err^{+kP}
    # (the positive prev_err exponent is what damps oscillation — a small
    # accepted error must not permanently inflate later factors)
    k_i = 0.7 / 2.0
    k_p = 0.4 / 2.0

    def error_rms(y_full, y_half):
        tol = atol + rtol * jnp.maximum(jnp.abs(y_full), jnp.abs(y_half))
        e = (y_full - y_half) / tol
        return jnp.sqrt(jnp.mean(e * e))

    ys0 = jnp.broadcast_to(y0, (T,) + y0.shape).astype(jnp.float32)
    carry0 = dict(
        t=t_start,
        y=y0.astype(jnp.float32),
        dt=jnp.asarray(dt0, jnp.float32),
        prev_err=jnp.asarray(1.0, jnp.float32),  # neutral PI memory
        ys=ys0,
        n_acc=jnp.zeros((), jnp.int32),
        n_rej=jnp.zeros((), jnp.int32),
    )

    def body(_, c):
        active = c["t"] < t_end
        dt = jnp.maximum(c["dt"], dt_min)
        t0, y = c["t"], c["y"]
        # clip to the interval end, STRETCHING any step that would leave a
        # final sliver < dt_min: a remainder below the Brownian-tree leaf
        # resolution quantizes both endpoints to the same leaf and would
        # integrate the last segment drift-only (zero increment)
        t1 = jnp.where(t_end - (t0 + dt) < dt_min, t_end, t0 + dt)
        tm = 0.5 * (t0 + t1)

        f0, g0 = f(t0, y), g(t0, y)
        # evaluate each Brownian endpoint ONCE and form increments by
        # subtraction (increment() is defined as exactly that): three
        # Lévy-bridge descents instead of six per step
        w0, wm, w1 = tree(t0), tree(tm), tree(t1)
        # full step and first half step share (f0, g0) — Euler evaluates
        # at the segment start
        y_full = y + f0 * (t1 - t0) + g0 * (w1 - w0)
        y_mid = y + f0 * (tm - t0) + g0 * (wm - w0)
        y_half = (
            y_mid
            + f(tm, y_mid) * (t1 - tm)
            + g(tm, y_mid) * (w1 - wm)
        )

        err = jax.lax.stop_gradient(error_rms(y_full, y_half))
        err = jnp.maximum(err, 1e-10)
        factor = jnp.clip(
            safety * err ** (-(k_i + k_p)) * c["prev_err"] ** k_p,
            min_factor,
            max_factor,
        )
        dt_new = jnp.maximum(dt * factor, dt_min)

        accept = active & ((err <= 1.0) | (dt <= dt_min))
        t_next = jnp.where(accept, t1, t0)
        y_next = jnp.where(accept, y_half, y)

        # write interpolated outputs for grid points crossed by this step
        hit = accept & (out_ts > t0) & (out_ts <= t1)
        w = jnp.where(t1 > t0, (out_ts - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0)
        interp = (
            y[None] * (1.0 - w).reshape((T,) + (1,) * y.ndim)
            + y_half[None] * w.reshape((T,) + (1,) * y.ndim)
        )
        ys = jnp.where(hit.reshape((T,) + (1,) * y.ndim), interp, c["ys"])

        return dict(
            t=t_next,
            y=y_next,
            dt=jnp.where(active, dt_new, c["dt"]),
            prev_err=jnp.where(accept, err, c["prev_err"]),
            ys=ys,
            n_acc=c["n_acc"] + accept.astype(jnp.int32),
            n_rej=c["n_rej"] + (active & ~accept).astype(jnp.int32),
        )

    if unroll:
        # static Python unroll: required when f/g are flax module calls
        # (linen cannot create/reference params inside lax control flow);
        # masked no-op iterations keep the semantics identical
        c = carry0
        for i in range(max_steps):
            c = body(i, c)
    else:
        c = jax.lax.fori_loop(0, max_steps, body, carry0)
    # grid points never reached (max_steps exhausted) hold the final state
    unreached = out_ts > c["t"]
    ys = jnp.where(
        unreached.reshape((T,) + (1,) * y0.ndim), c["y"][None], c["ys"]
    )
    stats = dict(
        n_accepted=c["n_acc"],
        n_rejected=c["n_rej"],
        final_dt=c["dt"],
        converged=c["t"] >= t_end,
    )
    return ys, stats


def ou_moments(y0: jax.Array, theta: float, mu: float, sigma: float, t: jax.Array):
    """Analytic mean/var of the Ornstein–Uhlenbeck process (test oracle).

    ``dy = θ(μ − y) dt + σ dW`` ⇒  E[y_t] = μ + (y0 − μ)e^{−θt},
    Var[y_t] = σ²(1 − e^{−2θt}) / (2θ).
    """
    mean = mu + (y0 - mu) * jnp.exp(-theta * t)
    var = sigma**2 * (1.0 - jnp.exp(-2.0 * theta * t)) / (2.0 * theta)
    return mean, var
