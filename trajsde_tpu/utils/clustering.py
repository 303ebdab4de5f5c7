"""Sampled-trajectory → K-mode reduction (clustering + ranking).

Capability analog of ``models/utils/dec_utils.py:14-106`` (the reference's
``@ray.remote`` K-means + Ward ranking — dead code in its shipped configs
but part of the component inventory).  Here the endpoint K-means runs
vectorized under ``jit``/``vmap`` per scene — no actor pool needed — and a
host-side numpy fallback mirrors it.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_endpoints(
    trajs: jax.Array, key: jax.Array, k: int = 6, iters: int = 10
) -> Tuple[jax.Array, jax.Array]:
    """K-means over trajectory endpoints: ``trajs [S, T, 2]`` → (assignment
    [S], centers [k, 2]).  Lloyd iterations with empty-cluster carry-over."""
    pts = trajs[:, -1, :]
    # fewer samples than clusters: degrade to S clusters (choice with
    # replace=False requires k <= S; shapes are static so this is free)
    k = min(k, pts.shape[0])
    init_idx = jax.random.choice(key, pts.shape[0], (k,), replace=False)
    centers0 = pts[init_idx]

    def step(centers, _):
        d = jnp.sum((pts[:, None] - centers[None]) ** 2, -1)  # [S, k]
        assign = jnp.argmin(d, -1)
        onehot = jax.nn.one_hot(assign, k, dtype=pts.dtype)   # [S, k]
        counts = onehot.sum(0)
        sums = onehot.T @ pts
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers0, None, length=iters)
    d = jnp.sum((pts[:, None] - centers[None]) ** 2, -1)
    return jnp.argmin(d, -1), centers


def cluster_and_rank(
    trajs: np.ndarray, k: int = 6, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Reduce S sampled trajectories to k ranked modes.

    Returns (modes [k, T, 2], probs [k]): per-cluster mean trajectory and
    cluster-mass ranking (descending), the reduction
    ``cluster_traj``/``cluster_and_rank`` performs in the reference.
    """
    S, T, _ = trajs.shape
    k = min(k, S)
    assign, _ = kmeans_endpoints(jnp.asarray(trajs), jax.random.key(seed), k=k)
    assign = np.asarray(assign)
    modes = np.zeros((k, T, 2), np.float32)
    probs = np.zeros((k,), np.float32)
    # one rng for ALL empty-cluster fallbacks: re-seeding per cluster would
    # hand every empty cluster the identical replacement trajectory
    fallback_rng = np.random.default_rng(seed)
    for c in range(k):
        m = assign == c
        probs[c] = m.mean()
        if m.any():
            modes[c] = trajs[m].mean(0)
        else:
            modes[c] = trajs[fallback_rng.integers(0, S)]
    order = np.argsort(-probs, kind="stable")
    return modes[order], probs[order]
