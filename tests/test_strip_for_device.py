"""strip_for_device: the host→device wire diet must be exact.

Two fields of the ``TemporalData``-parity contract are never read by any
jitted consumer (goal one-hots exist for preprocessing parity/submissions,
``positions[..., Th:, :]`` duplicates information that lives in ``y`` —
the reference likewise only *stores* them, ``models/utils/util.py:21-75``),
so the transfer path sheds them.  These tests pin that the diet is
byte-exact for training and eval, idempotent, group-axis-safe, and applied
by ``device_prefetch`` for host batches.
"""
import jax
import numpy as np
import optax
import pytest

from trajsde_tpu.data.scene import SceneBatch, strip_for_device
from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.losses import diff_bce_loss, l2_loss
from trajsde_tpu.train.loop import (
    create_train_state,
    device_prefetch,
    group_microbatches,
    make_eval_step,
    make_train_step,
)
from trajsde_tpu.train.metrics import make_metrics

from tests.test_models_forward import make_sde

B, A, L = 2, 6, 8


def _scene_with_goal(rng, batch=B):
    scene = make_scene_batch(
        rng, batch_size=batch, num_actors=A, num_lanes=L, sources=[0, 1]
    )
    goal = np.zeros((batch, A, L), np.float32)
    goal[:, :, 0] = 1.0
    return scene.replace(
        goal_idcs=goal, has_goal=np.ones((batch, A), bool)
    )


def test_strip_drops_goal_and_truncates_positions(rng):
    scene = _scene_with_goal(rng)
    th = scene.historical_steps
    stripped = strip_for_device(scene)
    assert stripped.goal_idcs is None and stripped.has_goal is None
    assert stripped.positions.shape == scene.positions.shape[:2] + (th, 2)
    np.testing.assert_array_equal(
        np.asarray(stripped.positions), np.asarray(scene.positions[:, :, :th])
    )
    # untouched fields pass through by identity (no host copy)
    assert stripped.x is scene.x and stripped.y is scene.y
    # idempotent: the second application is a no-op returning the same
    # object (double application CLI-generator + device_prefetch is free)
    assert strip_for_device(stripped) is stripped


def test_strip_handles_leading_group_axes(rng):
    scenes = [_scene_with_goal(rng) for _ in range(3)]
    (group,) = list(group_microbatches(iter(scenes), 3))
    th = scenes[0].historical_steps
    stripped = strip_for_device(group)
    assert stripped.positions.shape == (3, B, A, th, 2)
    assert stripped.goal_idcs is None


@pytest.mark.slow
def test_strip_exactness_train_and_eval(rng):
    """Stripped and full batches produce bit-identical steps and metrics."""
    full = _scene_with_goal(rng)
    stripped = strip_for_device(full)
    model = make_sde()
    opt = optax.adamw(1e-3)
    state = create_train_state(model, opt, stripped)
    losses = [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)]
    step = make_train_step(model, opt, losses, donate=False)

    state_f, logs_f = step(state, full)
    state_s, logs_s = step(state, stripped)
    assert float(logs_f["train/total"]) == float(logs_s["train/total"])
    for pf, ps in zip(
        jax.tree.leaves(state_f.params), jax.tree.leaves(state_s.params)
    ):
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(ps))

    metrics = make_metrics(
        ["ADE_T"], [{"dataset": "nuScenes", "end_idcs": [7, 7]}]
    )
    eval_step = make_eval_step(model, metrics)
    key = jax.random.key(0)
    c_f = eval_step(state.params, full, key, np.int32(0))
    c_s = eval_step(state.params, stripped, key, np.int32(0))
    for a, b in zip(jax.tree.leaves(c_f), jax.tree.leaves(c_s)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_prefetch_strips_host_batches(rng):
    # production loaders yield NUMPY batches (data/loader.py — transfer
    # happens once at the device boundary); the prefetch strip keys on
    # that, leaving already-placed device batches untouched
    full = jax.tree.map(np.asarray, _scene_with_goal(rng))
    th = full.historical_steps
    (out,) = list(device_prefetch(iter([full])))
    assert isinstance(out, SceneBatch)
    assert out.goal_idcs is None and out.has_goal is None
    assert out.positions.shape[-2] == th
    assert isinstance(out.x, jax.Array)
