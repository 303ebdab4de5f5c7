"""Pallas SDE rollout kernel vs the scan reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajsde_tpu.models.sde import SDEStep, decoder_time_grid, scanned
from trajsde_tpu.ops.pallas.sde_rollout import rollout_params_from_linen, sde_rollout

D, TF = 64, 12  # short horizon keeps interpret-mode tests quick
N = 16


class _Rollout:
    """Scan-path reference sharing the kernel's parameters."""

    def __init__(self, key):
        import flax.linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, y0, xs):
                return scanned(SDEStep, "roll", embed_dim=D, sde_layers=2)(y0, xs)

        self.mod = M()
        t0s, dts = decoder_time_grid(TF, 1.2)
        self.t0s, self.dts = t0s, dts
        y0 = jnp.zeros((N, D))
        self.params = self.mod.init({"params": key, "sde": jax.random.key(9)}, y0, (t0s, dts))

    def run(self, y0, key):
        _, ys = self.mod.apply(self.params, y0, (self.t0s, self.dts), rngs={"sde": key})
        return ys

    def kernel_params(self):
        return rollout_params_from_linen(self.params["params"]["roll"])


@pytest.fixture(scope="module")
def ref():
    return _Rollout(jax.random.key(0))


def test_drift_only_matches_scan(ref, rng):
    """With diffusion forced to 0 the kernel must match the scan exactly."""
    y0 = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    kp = dict(ref.kernel_params())
    # silence g: sigmoid output scaled to ~0 via huge negative bias
    kp["bgo"] = kp["bgo"] - 1e4
    noise = jnp.zeros((TF, N, D))
    ys_kernel = sde_rollout(
        y0, kp, ref.t0s, ref.dts, jnp.int32(0), num_steps=TF,
        block_rows=8, interpret=True, noise=noise,
    )

    # scan with the same silenced diffusion
    import flax

    sp = flax.core.unfreeze(ref.params)
    sp["params"]["roll"]["g_func"]["dense_out"]["bias"] = (
        sp["params"]["roll"]["g_func"]["dense_out"]["bias"] - 1e4
    )
    from trajsde_tpu.models.sde import SDEStep as _S  # reuse module apply
    _, ys_scan = ref.mod.apply(
        sp, y0, (ref.t0s, ref.dts), rngs={"sde": jax.random.key(3)}
    )
    np.testing.assert_allclose(
        np.asarray(ys_kernel), np.asarray(ys_scan), rtol=2e-4, atol=2e-5
    )


def test_stochastic_moments_match(ref, rng):
    """With noise on, kernel and scan paths agree in distribution."""
    y0 = jnp.zeros((2048, D))
    kp = ref.kernel_params()
    noise = jax.random.normal(jax.random.key(5), (TF, 2048, D))
    ys_kernel = sde_rollout(
        y0, kp, ref.t0s, ref.dts, jnp.int32(7), num_steps=TF,
        block_rows=128, interpret=True, noise=noise,
    )
    ys_scan = ref.run(y0, jax.random.key(11))
    k = np.asarray(ys_kernel[-1])
    s = np.asarray(ys_scan[-1])
    # MC error of the mean ≈ std/√2048 ≈ 0.025; 4σ tolerance
    np.testing.assert_allclose(k.mean(0), s.mean(0), atol=0.1)
    np.testing.assert_allclose(k.std(0), s.std(0), atol=0.1)


def test_row_padding_roundtrip(ref, rng):
    """N not divisible by block_rows still returns exactly N rows."""
    y0 = jnp.asarray(rng.normal(size=(13, D)).astype(np.float32))
    ys = sde_rollout(
        y0, ref.kernel_params(), ref.t0s, ref.dts, jnp.int32(1),
        num_steps=TF, block_rows=8, interpret=True,
        noise=jax.random.normal(jax.random.key(2), (TF, 13, D)),
    )
    assert ys.shape == (TF, 13, D)
    assert np.isfinite(np.asarray(ys)).all()
