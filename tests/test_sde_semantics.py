"""Tests for the deliberate reference quirks (SURVEY §7 "hard parts")."""
import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.models.layers import GRUUnit
from trajsde_tpu.models.sde import decoder_time_grid, encoder_time_grid


def test_encoder_time_grid_segments():
    """21 segments: first [−0.01, 0] (dt=0.01), then 0.1-steps up to 2.0
    (``enc_hivt_nusargo_sde_sep2.py:128-135,175-179``)."""
    t0s, dts = encoder_time_grid(21, 2.0, 0.1)
    t0s, dts = np.asarray(t0s), np.asarray(dts)
    assert t0s.shape == (21,)
    np.testing.assert_allclose(t0s[0], -0.01, atol=1e-7)
    np.testing.assert_allclose(dts[0], 0.01, atol=1e-7)
    np.testing.assert_allclose(dts[1:], 0.1, atol=1e-6)
    np.testing.assert_allclose(t0s[1:], np.arange(20) * 0.1, atol=1e-5)


def test_decoder_time_grid():
    t0s, dts = decoder_time_grid(60, 6.0)
    assert t0s.shape == (60,)
    np.testing.assert_allclose(np.asarray(dts), 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t0s)[-1], 5.9, atol=1e-5)


def test_gru_mask_gates_carry():
    """Unobserved steps must pass the SDE state through unchanged
    (``ode_utils.py:148-150``)."""
    gru = GRUUnit(8, 8)
    h = jnp.ones((4, 8))
    x = jnp.full((4, 8), 2.0)
    params = gru.init(jax.random.key(0), h, x, jnp.ones(4, bool))
    h_obs = gru.apply(params, h, x, jnp.ones(4, bool))
    h_unobs = gru.apply(params, h, x, jnp.zeros(4, bool))
    np.testing.assert_array_equal(np.asarray(h_unobs), np.asarray(h))
    assert not np.allclose(np.asarray(h_obs), np.asarray(h))


def test_eos_index_rule():
    """eos = ref_time − argmax(bos): the iteration at which the backwards
    RNN has consumed the actor's whole history (``:187-191``)."""
    ref_time = 20
    bos = np.zeros((1, 3, 21), bool)
    bos[0, 0, 0] = True    # full history → eos 20 (last iteration)
    bos[0, 1, 15] = True   # starts at 15 → eos 5
    bos[0, 2, 20] = True   # only the ref step → eos 0 (first iteration)
    eos = ref_time - np.argmax(bos.astype(np.int32), axis=-1)
    np.testing.assert_array_equal(eos[0], [20, 5, 0])
