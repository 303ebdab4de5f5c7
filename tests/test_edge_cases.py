"""Degenerate-input robustness: the dense formulation must stay finite for
every mask pattern the padded world can produce."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.losses import l2_loss

from tests.test_models_forward import make_sde

B, A, L = 2, 6, 8


def _fwd(model, params, scene):
    return jax.jit(lambda p, s, k: model.apply(p, s, rngs={"sde": k}))(
        params, scene, jax.random.key(2)
    )


def test_single_actor_scene(rng):
    """Only the agent exists: zero AA edges everywhere (pure self path)."""
    scene = make_scene_batch(rng, batch_size=B, num_actors=A, num_lanes=L)
    valid = np.zeros((B, A), bool)
    valid[:, 0] = True
    pad = np.asarray(scene.padding_mask).copy()
    pad[~valid] = True
    scene = dataclasses.replace(
        scene,
        actor_valid=jnp.asarray(valid),
        padding_mask=jnp.asarray(pad),
    )
    model = make_sde()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    out = _fwd(model, params, scene)
    assert np.isfinite(np.asarray(out["loc"])).all()
    assert np.isfinite(np.asarray(out["diff_in"])).all()


def test_no_lanes_scene(rng):
    """Zero valid lanes: the AL block must reduce to the gated self path."""
    scene = make_scene_batch(rng, batch_size=B, num_actors=A, num_lanes=L)
    scene = dataclasses.replace(
        scene, lane_valid=jnp.zeros((B, L), bool),
        lane_paddings=jnp.ones((B, L, 10), bool),
    )
    model = make_sde()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    out = _fwd(model, params, scene)
    assert np.isfinite(np.asarray(out["loc"])).all()


def test_no_future_labels_loss_is_zero(rng):
    """All futures padded ⇒ reg_mask empty ⇒ L2 loss exactly 0 (reference
    returns 0 on empty masks, ``losses/L2.py:27``)."""
    scene = make_scene_batch(rng, batch_size=B, num_actors=A, num_lanes=L)
    pad = np.asarray(scene.padding_mask).copy()
    pad[:, :, 21:] = True
    scene = dataclasses.replace(scene, padding_mask=jnp.asarray(pad))
    model = make_sde()
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
    )
    out = _fwd(model, params, scene)
    assert float(l2_loss(out["y"], out)) == 0.0


def test_far_apart_actors_no_aa_edges(rng):
    """Actors beyond the 50 m radius never attend to each other."""
    scene = make_scene_batch(rng, batch_size=1, num_actors=3, num_lanes=4)
    pos = np.asarray(scene.positions).copy()
    for a in range(3):
        pos[0, a] += np.array([a * 1000.0, 0.0], np.float32)
    scene = dataclasses.replace(scene, positions=jnp.asarray(pos))
    from trajsde_tpu.models import graph

    mask = np.asarray(graph.aa_masks(scene, 50.0))
    assert not mask.any()
