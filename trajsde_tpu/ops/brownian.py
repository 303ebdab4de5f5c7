"""Counter-based virtual Brownian tree (stateless Brownian-motion queries).

TPU-native replacement for torchsde's C++ ``BrownianInterval``
(the reference constructs one per ``sdeint`` call,
``models/utils/sdeint.py:983``): instead of a mutable cache of interval
draws, Brownian values are *recomputed on demand* from a splittable PRNG
key by Lévy-bridge descent over a dyadic grid.  Properties:

* **stateless / jit-pure** — a query is ``depth`` fold_in+normal draws
  inside the trace; no host state, no cache, works under ``vmap``/``scan``
  and any data sharding;
* **path-consistent** — ``W(s,u) + W(u,t) == W(s,t)`` exactly (both sides
  reduce to the same tree nodes), which is what step-doubling adaptive
  solvers require of their noise source;
* **reproducible** — the path is a pure function of the key, independent
  of query order and of how integration steps are sized or sharded (a
  capability the reference's BrownianInterval lacks across world sizes).

Queries quantize ``t`` to the ``2**depth`` leaf grid (the same tolerance
contract as diffrax's ``VirtualBrownianTree``).
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


class BrownianTree:
    """Virtual Brownian path ``W`` on ``[t0, t1]`` with ``W(t0) = 0``.

    ``shape``/``dtype`` describe the state whose noise is being driven;
    every query returns that shape.  ``depth`` levels give a dyadic
    resolution of ``(t1 - t0) / 2**depth``.
    """

    def __init__(self, key, t0, t1, shape, dtype=jnp.float32, depth: int = 12):
        self.key = key
        # t0/t1 may be python floats or traced scalars (the SDE encoder
        # queries a fresh tree per scanned segment with traced bounds)
        self.t0 = jnp.asarray(t0, jnp.float32)
        self.t1 = jnp.asarray(t1, jnp.float32)
        self.shape = tuple(shape)
        self.dtype = dtype
        self.depth = int(depth)
        self._n_leaves = 2 ** self.depth
        self._span = self.t1 - self.t0

    def _quantize(self, t) -> jax.Array:
        x = (jnp.asarray(t, jnp.float32) - self.t0) / self._span
        idx = jnp.round(x * self._n_leaves).astype(jnp.int32)
        return jnp.clip(idx, 0, self._n_leaves)

    def _w_at_idx(self, idx: jax.Array) -> jax.Array:
        """W at dyadic leaf ``idx`` by Lévy-bridge descent.

        Midpoints of dyadic intervals are distinct integers across all
        levels (odd multiples of decreasing powers of two), so the
        midpoint index itself is the unique per-node PRNG counter.
        """
        span = jnp.asarray(self._span, self.dtype)
        w_end = jax.random.normal(
            jax.random.fold_in(self.key, self._n_leaves), self.shape, self.dtype
        ) * jnp.sqrt(span)

        def level(_, carry):
            lo, hi, w_lo, w_hi = carry
            mid = (lo + hi) // 2
            # bridge: W(mid) | W(lo), W(hi) ~ N(mean, (hi-lo)·leaf_dt / 4)
            half_dt = (hi - lo).astype(self.dtype) * (span / self._n_leaves) * 0.5
            z = jax.random.normal(
                jax.random.fold_in(self.key, mid), self.shape, self.dtype
            )
            w_mid = 0.5 * (w_lo + w_hi) + jnp.sqrt(half_dt * 0.5) * z
            go_left = idx <= mid
            lo = jnp.where(go_left, lo, mid)
            hi = jnp.where(go_left, mid, hi)
            w_lo = jnp.where(go_left, w_lo, w_mid)
            w_hi = jnp.where(go_left, w_mid, w_hi)
            # the interval length is exactly 2^(depth-k) at level k, so it
            # is ≥ 2 on every iteration and reaches exactly 1 on exit —
            # lo == hi can never occur inside the loop
            return lo, hi, w_lo, w_hi

        lo0 = jnp.zeros((), jnp.int32)
        hi0 = jnp.full((), self._n_leaves, jnp.int32)
        w_lo0 = jnp.zeros(self.shape, self.dtype)
        lo, hi, w_lo, w_hi = jax.lax.fori_loop(
            0, self.depth, level, (lo0, hi0, w_lo0, w_end)
        )
        return jnp.where(idx <= lo, w_lo, w_hi)

    def __call__(self, t) -> jax.Array:
        """W(t) (quantized to the leaf grid)."""
        return self._w_at_idx(self._quantize(t))

    def increment(self, ta, tb) -> jax.Array:
        """W(tb) − W(ta); exactly additive over adjacent intervals."""
        return self._w_at_idx(self._quantize(tb)) - self._w_at_idx(self._quantize(ta))
