"""Round-2 parity fixes: loud config failures, delta-mode eval conversion,
goal/seq-id packing, only-agent filtering, device-side metric accumulation."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajsde_tpu.data.grid import align_to_grid
from trajsde_tpu.data.pack import pack_scenes
from trajsde_tpu.data.synthetic import make_raw_scene, make_scene_batch
from trajsde_tpu.data.transforms import leave_only_agent, leave_only_agent_output
from trajsde_tpu.train.loop import agent_slices
from trajsde_tpu.train.metrics import TransferMetric


# ---------------------------------------------------------------------------
# loud failure on unsupported config (reference ships adaptive: false and
# the 'continuous' dataset mode as NotImplementedError)
# ---------------------------------------------------------------------------
def test_sde_encoder_rejects_unsupported(rng):
    # adaptive: true is now a real capability (tests/test_adaptive.py and
    # test_sde_encoder_adaptive below); milstein/adjoint still refuse loudly
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    scene = make_scene_batch(rng, batch_size=1, num_actors=2, num_lanes=4)
    for kwargs in ({"method": "milstein"}, {"adjoint": True}):
        enc = LocalEncoderSDESep(historical_steps=21, embed_dim=8, **kwargs)
        with pytest.raises(NotImplementedError):
            jax.eval_shape(
                lambda s: enc.init(
                    {"params": jax.random.key(0), "sde": jax.random.key(1)}, s
                ),
                scene,
            )


@pytest.mark.slow
def test_sde_encoder_adaptive(rng):
    """adaptive: true runs bounded step-doubling inside each segment —
    same parameter tree as fixed-grid, finite outputs and gradients."""
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    scene = make_scene_batch(rng, batch_size=2, num_actors=3, num_lanes=6)
    rngs = {"params": jax.random.key(0), "sde": jax.random.key(1)}
    enc_fix = LocalEncoderSDESep(historical_steps=21, embed_dim=8, num_heads=2)
    enc_ada = LocalEncoderSDESep(
        historical_steps=21, embed_dim=8, num_heads=2, adaptive=True,
        rtol=1e-2, atol=1e-2,
    )
    p_fix = enc_fix.init(rngs, scene)["params"]
    p_ada = enc_ada.init(rngs, scene)["params"]
    # identical parameter trees: checkpoints swap between solver modes
    assert jax.tree_util.tree_structure(p_fix) == jax.tree_util.tree_structure(p_ada)

    def loss(p):
        out, diff_in, diff_out, _, _ = enc_ada.apply(
            {"params": p}, scene, rngs={"sde": jax.random.key(2)}
        )
        return jnp.sum(out**2) + jnp.sum(diff_in) + jnp.sum(diff_out)

    val, grads = jax.value_and_grad(loss)(p_ada)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)


def test_sde_decoder_rejects_non_euler(rng):
    from trajsde_tpu.models.decoders import SDEDecoder

    scene = make_scene_batch(rng, batch_size=1, num_actors=2, num_lanes=4)
    dec = SDEDecoder(
        local_channels=8, global_channels=8, future_steps=60, num_modes=2,
        method="srk",
    )
    local = jnp.zeros((1, 2, 8))
    glob = jnp.zeros((1, 2, 2, 8))
    with pytest.raises(NotImplementedError):
        jax.eval_shape(
            lambda s, l, g: dec.init(
                {"params": jax.random.key(0), "sde": jax.random.key(1)}, s, l, g
            ),
            scene, local, glob,
        )


def test_dataset_rejects_continuous_mode():
    from trajsde_tpu.data.loader import NuArgoDataset

    with pytest.raises(NotImplementedError):
        NuArgoDataset("train", type="continuous")


# ---------------------------------------------------------------------------
# delta-target (is_gtabs=False) eval conversion — model_base_mix.py:143-145
# ---------------------------------------------------------------------------
def test_agent_slices_delta_cumsum(rng):
    scene = make_scene_batch(rng, batch_size=2, num_actors=4, num_lanes=8)
    B, A, Tf = 2, 4, scene.future_steps
    out = {
        "loc": jnp.asarray(rng.normal(size=(B, 3, A, Tf, 2)).astype(np.float32)),
        "y": scene.y,
        "reg_mask": ~scene.padding_mask[:, :, -Tf:],
    }
    pred_a, targ_a, _, _ = agent_slices(scene, out, is_gtabs=True)
    pred_d, targ_d, _, _ = agent_slices(scene, out, is_gtabs=False)
    np.testing.assert_allclose(
        np.asarray(pred_d), np.cumsum(np.asarray(pred_a), axis=-2), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(targ_d), np.cumsum(np.asarray(targ_a), axis=-2), rtol=1e-4, atol=1e-5
    )


# ---------------------------------------------------------------------------
# goal_idcs / has_goal / seq_id packed through pack_scenes
# ---------------------------------------------------------------------------
def test_pack_carries_goal_and_seq_fields(rng):
    scenes = []
    for s in (0, 1):
        raw = make_raw_scene(rng, s, num_actors=6, num_lanes=8)
        g = align_to_grid(raw)
        N, L = g["x"].shape[0], g["lane_positions"].shape[0]
        goal = np.zeros((N, L), np.float32)
        goal[0, 2] = 1.0  # the agent's goal lane
        g["goal_idcs"] = goal
        g["has_goal"] = goal.any(-1)
        g["seq_id"] = np.int32(100 + s)
        scenes.append(g)

    # capacities >= scene sizes: the keep-orders are pure permutations
    batch = pack_scenes(scenes, num_actors=8, num_lanes=16, as_jax=False)
    assert batch.goal_idcs.shape == (2, 8, 16)
    assert batch.has_goal.shape == (2, 8)
    np.testing.assert_array_equal(batch.seq_id, [100, 101])
    for b in range(2):
        a = int(batch.agent_index[b])
        assert batch.has_goal[b, a]
        assert batch.goal_idcs[b, a].sum() == 1.0
        # the goal one-hot points at the packed slot of original lane 2
        lane2 = scenes[b]["lane_positions"][2]
        slot = int(np.argmax(batch.goal_idcs[b, a]))
        valid = ~scenes[b]["lane_paddings"][2].astype(bool)
        np.testing.assert_allclose(
            batch.lane_positions[b, slot][valid], lane2[valid], rtol=1e-6
        )
    # total goal count preserved (no truncation at these capacities)
    assert batch.goal_idcs.sum() == sum(s["goal_idcs"].sum() for s in scenes)


def test_pack_without_goal_fields_defaults(rng):
    scenes = [align_to_grid(make_raw_scene(rng, 1, num_actors=4, num_lanes=6))]
    batch = pack_scenes(scenes, num_actors=6, num_lanes=8, as_jax=False)
    assert batch.goal_idcs is None and batch.has_goal is None
    np.testing.assert_array_equal(batch.seq_id, [0])


# ---------------------------------------------------------------------------
# only-agent filtering: metric inputs are identical either way
# ---------------------------------------------------------------------------
def test_leave_only_agent_equivalence(rng):
    scene = make_scene_batch(rng, batch_size=3, num_actors=5, num_lanes=8)
    # make the agent a non-zero slot to exercise the gather
    scene = dataclasses.replace(scene, agent_index=jnp.asarray([1, 0, 3], jnp.int32))
    B, A, Tf = 3, 5, scene.future_steps
    out = {
        "loc": jnp.asarray(rng.normal(size=(B, 2, A, Tf, 4)).astype(np.float32)),
        "pi": jnp.asarray(rng.normal(size=(B, A, 2)).astype(np.float32)),
        "y": scene.y,
        "reg_mask": ~scene.padding_mask[:, :, -Tf:],
    }
    direct = agent_slices(scene, out)
    filt_out = leave_only_agent_output(out, scene.agent_index)
    filt_scene = leave_only_agent(scene)
    filt_scene = dataclasses.replace(filt_scene, y=filt_out["y"])
    filtered = agent_slices(filt_scene, filt_out)
    assert filt_out["loc"].shape[2] == 1 and filt_scene.x.shape[1] == 1
    for d, f in zip(direct, filtered):
        np.testing.assert_allclose(np.asarray(d), np.asarray(f), rtol=1e-6)


# ---------------------------------------------------------------------------
# metric accumulation stays on device until compute()
# ---------------------------------------------------------------------------
def test_metric_accumulates_device_arrays():
    m = TransferMetric("ADE_T", dataset="nuScenes", end_idcs=[59, 29])
    m.accumulate((jnp.asarray(3.0), jnp.asarray(2.0)))
    m.accumulate((jnp.asarray(1.0), jnp.asarray(2.0)))
    assert isinstance(m._sum, jax.Array)  # no per-batch host pull
    assert m.compute() == pytest.approx(1.0)
    m.reset()
    # empty accumulator reads NaN, not a perfect-looking 0.0
    assert np.isnan(m.compute())
