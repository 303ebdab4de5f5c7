"""Numerical unit tests for the integration ops and attention primitives."""
import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.models.layers import masked_softmax
from trajsde_tpu.ops.sdeint import euler_maruyama, ou_moments


def test_euler_maruyama_matches_ou_moments():
    """Integrate an OU process; empirical moments must match analytics."""
    theta, mu, sigma = 1.0, 0.3, 0.5
    n, d = 4096, 4
    y0 = jnp.full((n, d), 2.0)
    ts = jnp.linspace(0.0, 1.0, 11)  # dt = 0.1, as the reference grids

    f = lambda t, y: theta * (mu - y)
    g = lambda t, y: jnp.full(y.shape[:-1] + (1,), sigma)

    ys, gs = jax.jit(lambda k: euler_maruyama(f, g, y0, ts, k))(jax.random.key(0))
    yT = np.asarray(ys[-1]).reshape(-1)
    # exact moments of the DISCRETE Euler-Maruyama chain:
    #   y_{k+1} = y_k + θ(μ−y_k)dt + σ√dt ε  ⇒  a = 1−θdt
    #   E y_n = μ + (y0−μ)aⁿ,  Var y_n = σ²dt(1−a²ⁿ)/(1−a²)
    dt, steps = 0.1, 10
    a = 1 - theta * dt
    mean_n = mu + (2.0 - mu) * a**steps
    var_n = sigma**2 * dt * (1 - a ** (2 * steps)) / (1 - a**2)
    assert abs(yT.mean() - mean_n) < 0.01  # MC error ~ σ/√(n·d) ≈ 0.004
    assert abs(yT.var() - var_n) < 0.01
    # and the continuous-time analytics are approached to O(dt)
    mean_c, var_c = ou_moments(2.0, theta, mu, sigma, 1.0)
    assert abs(mean_n - float(mean_c)) < 0.05
    assert abs(var_n - float(var_c)) < 0.05
    assert gs.shape == (10, n, 1)


def test_euler_maruyama_deterministic_drift():
    """With g = 0 the scheme must be plain explicit Euler."""
    f = lambda t, y: -y
    g = lambda t, y: jnp.zeros(y.shape[:-1] + (1,))
    y0 = jnp.ones((3, 2))
    ts = jnp.linspace(0.0, 0.5, 6)
    ys, _ = euler_maruyama(f, g, y0, ts, jax.random.key(0))
    expected = np.ones((3, 2)) * (1 - 0.1) ** 5
    np.testing.assert_allclose(np.asarray(ys[-1]), expected, rtol=1e-6)


def test_masked_softmax_matches_scatter_semantics():
    """Dense masked softmax == per-row softmax over present edges only."""
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(5, 7)) > 0.5)
    out = np.asarray(masked_softmax(logits, mask, axis=-1))
    for i in range(5):
        idx = np.nonzero(np.asarray(mask)[i])[0]
        if idx.size == 0:
            np.testing.assert_array_equal(out[i], 0.0)
        else:
            e = np.exp(np.asarray(logits)[i, idx] - np.asarray(logits)[i, idx].max())
            np.testing.assert_allclose(out[i, idx], e / e.sum(), rtol=1e-5)
            other = np.setdiff1d(np.arange(7), idx)
            np.testing.assert_array_equal(out[i, other], 0.0)


def test_masked_softmax_all_masked_rows_zero():
    logits = jnp.ones((2, 3))
    mask = jnp.zeros((2, 3), bool)
    out = np.asarray(masked_softmax(logits, mask, axis=-1))
    np.testing.assert_array_equal(out, 0.0)
