"""Adaptive SDE integration: virtual Brownian tree + step-doubling solver.

Covers the reference's adaptive solver branch (``models/utils/sdeint.py:
349-381`` — step doubling, rtol/atol error, linear output interpolation)
and its noise source (torchsde's BrownianInterval, ``sdeint.py:983``),
re-designed TPU-native: counter-based Brownian tree + bounded masked loop.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajsde_tpu.ops.brownian import BrownianTree
from trajsde_tpu.ops.sdeint import ou_moments, sdeint_adaptive


class TestBrownianTree:
    def test_path_consistency(self):
        """W(s,u) + W(u,t) == W(s,t) exactly — the step-doubling contract."""
        tree = BrownianTree(jax.random.key(0), 0.0, 1.0, (8,), depth=10)
        for s, u, t in [(0.0, 0.5, 1.0), (0.125, 0.25, 0.75), (0.0, 0.0625, 0.125)]:
            lhs = tree.increment(s, u) + tree.increment(u, t)
            rhs = tree.increment(s, t)
            np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_marginal_distribution(self):
        """W(t) ~ N(0, t): mean and variance over many path dimensions."""
        n = 20_000
        tree = BrownianTree(jax.random.key(1), 0.0, 2.0, (n,), depth=8)
        for t in (0.5, 1.0, 2.0):
            w = np.asarray(tree(t))
            assert abs(w.mean()) < 4.0 * np.sqrt(t / n)
            np.testing.assert_allclose(w.var(), t, rtol=0.05)

    def test_reproducible_and_key_dependent(self):
        tree_a = BrownianTree(jax.random.key(2), 0.0, 1.0, (4,), depth=6)
        tree_a2 = BrownianTree(jax.random.key(2), 0.0, 1.0, (4,), depth=6)
        tree_b = BrownianTree(jax.random.key(3), 0.0, 1.0, (4,), depth=6)
        np.testing.assert_array_equal(np.asarray(tree_a(0.625)), np.asarray(tree_a2(0.625)))
        assert not np.allclose(np.asarray(tree_a(0.625)), np.asarray(tree_b(0.625)))

    def test_query_order_independence(self):
        """Values are pure functions of (key, t) — no hidden cursor state."""
        tree = BrownianTree(jax.random.key(4), 0.0, 1.0, (3,), depth=8)
        first = np.asarray(tree(0.75))
        _ = tree(0.25), tree(1.0), tree(0.5)
        np.testing.assert_array_equal(first, np.asarray(tree(0.75)))

    def test_traced_bounds(self):
        """Bounds may be traced scalars (per-segment trees under scan)."""

        @jax.jit
        def inc(t0, t1):
            tree = BrownianTree(jax.random.key(5), t0, t1, (4,), depth=6)
            return tree.increment(t0, t1)

        out = inc(jnp.float32(0.3), jnp.float32(0.9))
        assert np.all(np.isfinite(np.asarray(out)))


class TestAdaptiveSolver:
    def test_ode_accuracy_linear_decay(self):
        """g=0 reduces to adaptive Euler on dy=-y dt; matches e^{-t}."""
        f = lambda t, y: -y
        g = lambda t, y: jnp.zeros_like(y)
        y0 = jnp.ones((4,))
        ts = jnp.array([0.0, 0.5, 1.0])
        ys, stats = sdeint_adaptive(
            f, g, y0, ts, jax.random.key(0), dt0=0.25, rtol=1e-4, atol=1e-5
        )
        assert bool(stats["converged"])
        # global error ≈ n_steps × local tol for order-1 Euler
        np.testing.assert_allclose(np.asarray(ys[0]), np.exp(-0.5), rtol=1e-2)
        np.testing.assert_allclose(np.asarray(ys[1]), np.exp(-1.0), rtol=1e-2)

    def test_tighter_tolerance_takes_more_steps(self):
        f = lambda t, y: jnp.sin(8.0 * t) * y
        g = lambda t, y: jnp.zeros_like(y)
        y0 = jnp.ones((2,))
        ts = jnp.array([0.0, 1.0])

        def n_steps(rtol):
            _, stats = sdeint_adaptive(
                f, g, y0, ts, jax.random.key(0), dt0=0.5, rtol=rtol, atol=rtol,
                max_steps=512, dt_min=1e-5,
            )
            assert bool(stats["converged"])
            return int(stats["n_accepted"])

        assert n_steps(1e-4) > n_steps(1e-2)

    def test_ou_moments(self):
        """Adaptive Euler–Maruyama reproduces OU mean/variance."""
        theta, mu, sigma = 1.0, 0.3, 0.5
        f = lambda t, y: theta * (mu - y)
        g = lambda t, y: jnp.full_like(y, sigma)
        n = 8192
        y0 = jnp.full((n, 1), 1.5)
        ts = jnp.array([0.0, 1.0])
        ys, stats = sdeint_adaptive(
            f, g, y0, ts, jax.random.key(7), dt0=0.05, rtol=2e-3, atol=2e-3,
            max_steps=128, depth=10,
        )
        assert bool(stats["converged"])
        mean_ref, var_ref = ou_moments(1.5, theta, mu, sigma, 1.0)
        samples = np.asarray(ys[0, :, 0])
        # Euler–Maruyama weak error is O(dt); tolerances sized accordingly
        np.testing.assert_allclose(samples.mean(), float(mean_ref), atol=0.03)
        np.testing.assert_allclose(samples.var(), float(var_ref), rtol=0.15)

    def test_rejections_counted_and_dt_adapts(self):
        """A stiff drift from a too-large dt0 must reject at least once."""
        f = lambda t, y: -50.0 * y
        g = lambda t, y: jnp.zeros_like(y)
        y0 = jnp.ones((2,))
        _, stats = sdeint_adaptive(
            f, g, y0, jnp.array([0.0, 1.0]), jax.random.key(0),
            dt0=0.5, rtol=1e-3, atol=1e-3, max_steps=512, dt_min=1e-5,
        )
        assert bool(stats["converged"])
        assert int(stats["n_rejected"]) >= 1

    def test_differentiable(self):
        """Gradients flow through accept/reject masking to y0 and params."""
        def loss(scale):
            f = lambda t, y: -scale * y
            g = lambda t, y: jnp.zeros_like(y)
            ys, _ = sdeint_adaptive(
                f, g, jnp.ones((2,)), jnp.array([0.0, 1.0]), jax.random.key(0),
                dt0=0.2, rtol=1e-3, atol=1e-3, max_steps=64,
            )
            return jnp.sum(ys[-1])

        grad = jax.grad(loss)(1.0)
        # d/ds sum(2 * e^{-s}) at s=1 is -2e^{-1}
        np.testing.assert_allclose(float(grad), -2.0 * np.exp(-1.0), rtol=5e-2)

    def test_unroll_matches_fori(self):
        f = lambda t, y: -y
        g = lambda t, y: jnp.full_like(y, 0.2)
        y0 = jnp.ones((4,))
        ts = jnp.array([0.0, 0.4, 0.8])
        kw = dict(dt0=0.2, rtol=1e-3, atol=1e-3, max_steps=32)
        ys_a, st_a = sdeint_adaptive(f, g, y0, ts, jax.random.key(1), **kw)
        ys_b, st_b = sdeint_adaptive(
            f, g, y0, ts, jax.random.key(1), unroll=True, **kw
        )
        # identical math; tolerance covers XLA reassociation differences
        # between the fori-compiled and unrolled programs
        np.testing.assert_allclose(np.asarray(ys_a), np.asarray(ys_b), atol=1e-4)
        assert int(st_a["n_accepted"]) == int(st_b["n_accepted"])

    def test_output_interpolation_grid(self):
        """Dense output grid points are hit by linear interpolation."""
        f = lambda t, y: jnp.ones_like(y)  # y(t) = t
        g = lambda t, y: jnp.zeros_like(y)
        ts = jnp.linspace(0.0, 1.0, 11)
        ys, stats = sdeint_adaptive(
            f, g, jnp.zeros((1,)), ts, jax.random.key(0),
            dt0=0.37, rtol=1e-3, atol=1e-3,
        )
        assert bool(stats["converged"])
        np.testing.assert_allclose(
            np.asarray(ys[:, 0]), np.asarray(ts[1:]), atol=1e-5
        )
