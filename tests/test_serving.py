"""Serving path: pallas-rollout inference over the full flagship model."""
import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.serving import make_serving_fn

from tests.test_models_forward import make_sde

B, A, TF, D, K = 2, 8, 60, 64, 10


def test_serving_forward_matches_contract(rng):
    scene = make_scene_batch(rng, batch_size=B, num_actors=A, num_lanes=12, sources=[0, 1])
    model = make_sde()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    serve = make_serving_fn(model, params, block_rows=8, interpret=True)
    # explicit noise: the CPU interpreter lacks the on-core PRNG
    noise = jax.random.normal(jax.random.key(5), (TF, B * K * A, D))
    out = serve(scene, jax.random.key(2), jnp.int32(0), noise)
    assert out["loc"].shape == (B, K, A, TF, 4)
    assert out["pi"].shape == (B, A, K)
    assert np.isfinite(np.asarray(out["loc"])).all()
    assert np.all(np.asarray(out["loc"][..., 2:]) > 0)

    # standard training-path forward agrees on every non-rollout output
    full = model.apply(params, scene, rngs={"sde": jax.random.key(2)})
    np.testing.assert_allclose(
        np.asarray(out["pi"]), np.asarray(full["pi"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(out["reg_mask"]), np.asarray(full["reg_mask"])
    )


def test_kernel_engine_requires_sde_decoder(rng):
    """A non-SDE decoder (MLPDecoder) has no latent rollout to fuse; the
    kernel path must refuse with a clear message, not a params KeyError."""
    import pytest

    from tests.test_models_forward import make_baseline

    model = make_baseline()
    scene = make_scene_batch(
        np.random.default_rng(0), batch_size=1, num_actors=4, num_lanes=6
    )
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )["params"]
    with pytest.raises(NotImplementedError, match="SDEDecoder"):
        make_serving_fn(model, params, interpret=True)
