"""Synthetic scene generation for tests and benchmarks.

Produces ``SceneBatch``es with the exact invariants the real pipeline
emits after temporal-grid alignment (``dataset/nuScenes_Argoverse/
nuScenes_Argoverse.py:87-196``):

* the shared 21-past / 60-future slot grid at 10 Hz; nuScenes scenes
  (source 0) occupy every 5th past slot and every 5th future slot,
  Argoverse scenes (source 1) occupy past slots 1-20 and future slots 0-29;
* ``x`` = displacement features relative to the reference step, zeroed at
  padded slots, with the ÷5 nuScenes coordinate scaling applied to ``x``
  only; ``y`` = absolute future offsets from the reference position
  (``is_gtabs`` mode), unscaled;
* ``bos_mask`` True at each actor's first valid historical slot;
* constant-velocity-plus-noise kinematics, lanes as 1 m-resampled
  polylines chunked into ≤10-pose segments.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from trajsde_tpu.data.grid import NUS_SCALE, REF_TIME, TF, TH, domain_slot_masks
from trajsde_tpu.data.scene import SceneBatch

# the slot grid is the REAL pipeline's (one definition; fixtures that
# drift from data/grid.py would silently stop matching it)
grid_masks = domain_slot_masks

# domain-native step counts (what the offline preprocessors emit):
# nuScenes 2 Hz: 5 past (incl. ref) + 12 future; Argoverse 10 Hz: 20 + 30
DOMAIN_STEPS = {0: (5, 12), 1: (20, 30)}


def make_raw_scene(
    rng: np.random.Generator,
    source: int,
    num_actors: int = 12,
    num_lanes: int = 24,
    lane_poses: int = 10,
) -> dict:
    """Synthesize one DOMAIN-NATIVE scene dict — the serialized output
    format of the offline preprocessors (``Argoverse_abs.py:263-281``-style
    fields with per-domain step counts), BEFORE grid alignment.

    ``x`` holds past displacements relative to the reference position,
    ``y`` absolute future offsets from it, ``positions`` absolute poses —
    all unscaled meters (the ÷5 nuScenes scaling happens at load time).
    """
    tp, tf = DOMAIN_STEPS[source]
    tt = tp + tf
    N, L, S = num_actors, num_lanes, lane_poses
    dt = 0.5 if source == 0 else 0.1

    positions = np.zeros((N, tt, 2), np.float32)
    padding = np.ones((N, tt), bool)
    bos = np.zeros((N, tp), bool)
    angles = np.zeros((N,), np.float32)
    for a in range(N):
        p0 = rng.uniform(-40, 40, 2).astype(np.float32)
        vel = rng.uniform(-8, 8, 2).astype(np.float32)
        t_axis = (np.arange(tt) - (tp - 1)) * dt
        positions[a] = p0[None] + vel[None] * t_axis[:, None]
        angles[a] = np.arctan2(vel[1], vel[0])
        # start ≤ tp−2: an actor with future labels always has ≥2 past
        # observations, the invariant build_tracks enforces (hist < 2 or
        # padded-at-ref ⇒ future masked, preprocess/common.py)
        start = 0 if a == 0 else int(rng.integers(0, tp - 1))
        padding[a, start:] = False
        if rng.uniform() < 0.15 and a != 0:
            padding[a, tp:] = True
        positions[a][padding[a]] = 0.0
        bos[a, start] = True

    ref = positions[:, tp - 1]
    x = positions[:, :tp] - ref[:, None]
    x[padding[:, :tp]] = 0.0
    y = positions[:, tp:] - ref[:, None]
    y[padding[:, tp:]] = 0.0

    lane_positions = np.zeros((L, S, 2), np.float32)
    lane_paddings = np.ones((L, S), bool)
    for l in range(L):
        start = rng.uniform(-60, 60, 2).astype(np.float32)
        d = rng.uniform(-np.pi, np.pi)
        dvec = np.array([np.cos(d), np.sin(d)], np.float32)
        n_pose = int(rng.integers(2, S + 1))
        lane_positions[l, :n_pose] = start[None] + dvec[None] * np.arange(
            n_pose, dtype=np.float32
        )[:, None]
        lane_paddings[l, :n_pose] = False

    scene = dict(
        x=x.astype(np.float32),
        y=y.astype(np.float32),
        positions=positions,
        padding_mask=padding,
        bos_mask=bos,
        rotate_angles=angles,
        agent_index=np.int32(0),
        av_index=np.int32(0),
        theta=np.float32(rng.uniform(-np.pi, np.pi)),
        lane_positions=lane_positions,
        lane_paddings=lane_paddings,
        source=np.int32(source),
    )
    if source == 0:
        scene["category"] = rng.integers(0, 9, size=N).astype(np.int32)
    return scene


def make_scene_batch(
    rng: np.random.Generator,
    batch_size: int = 4,
    num_actors: int = 16,
    num_lanes: int = 32,
    lane_poses: int = 10,
    sources=None,
) -> SceneBatch:
    B, A, L, S = batch_size, num_actors, num_lanes, lane_poses
    T = TH + TF

    x = np.zeros((B, A, TH, 2), np.float32)
    y = np.zeros((B, A, TF, 2), np.float32)
    positions = np.zeros((B, A, T, 2), np.float32)
    padding = np.ones((B, A, T), bool)
    bos = np.zeros((B, A, TH), bool)
    angles = np.zeros((B, A), np.float32)
    actor_valid = np.zeros((B, A), bool)
    source = np.zeros((B,), np.int32)
    agent_index = np.zeros((B,), np.int32)

    lane_positions = np.zeros((B, L, S, 2), np.float32)
    lane_paddings = np.ones((B, L, S), bool)
    lane_valid = np.zeros((B, L), bool)

    for b in range(B):
        src = int(rng.integers(0, 2)) if sources is None else int(sources[b % len(sources)])
        source[b] = src
        past_slots, fut_slots = grid_masks(src)
        slot_mask = np.concatenate([past_slots, fut_slots])

        n_act = int(rng.integers(2, A + 1))
        actor_valid[b, :n_act] = True
        for a in range(n_act):
            p0 = rng.uniform(-40, 40, size=2).astype(np.float32)
            vel = rng.uniform(-8, 8, size=2).astype(np.float32)
            heading = np.arctan2(vel[1], vel[0]).astype(np.float32)
            t_axis = (np.arange(T) - REF_TIME) / 10.0
            traj = p0[None] + vel[None] * t_axis[:, None]
            traj += rng.normal(0, 0.05, size=traj.shape)
            positions[b, a] = traj.astype(np.float32)
            angles[b, a] = heading

            # appearance window: a random first-valid historical slot,
            # excluding the reference slot itself so every future-labeled
            # actor has ≥2 past observations (the build_tracks invariant)
            first_slot_choices = np.nonzero(past_slots)[0][:-1]
            start = int(rng.choice(first_slot_choices)) if a else 0
            valid = slot_mask.copy()
            valid[:start] = False
            if not valid[REF_TIME]:  # unseen at ref ⇒ no future (reference rule)
                valid[TH:] = False
            if rng.uniform() < 0.2 and a != 0:
                valid[TH:] = False  # some actors have no future labels
            padding[b, a] = ~valid
            positions[b, a][~valid] = 0.0

            vp = valid[:TH]
            if vp.any():
                first = int(np.argmax(vp))
                bos[b, a, first] = True
            ref_pos = positions[b, a, REF_TIME]
            x[b, a][vp] = positions[b, a, :TH][vp] - ref_pos
            vf = valid[TH:]
            y[b, a][vf] = positions[b, a, TH:][vf] - ref_pos
        if src == 0:
            x[b] /= NUS_SCALE

        agent_index[b] = 0  # actor 0 is always fully valid above

        n_lane = int(rng.integers(4, L + 1))
        lane_valid[b, :n_lane] = True
        for l in range(n_lane):
            start = rng.uniform(-60, 60, size=2).astype(np.float32)
            direction = rng.uniform(-np.pi, np.pi)
            d = np.array([np.cos(direction), np.sin(direction)], np.float32)
            n_pose = int(rng.integers(2, S + 1))
            poses = start[None] + d[None] * np.arange(n_pose, dtype=np.float32)[:, None]
            lane_positions[b, l, :n_pose] = poses
            lane_paddings[b, l, :n_pose] = False

    return SceneBatch(
        x=jnp.asarray(x),
        y=jnp.asarray(y),
        positions=jnp.asarray(positions),
        padding_mask=jnp.asarray(padding),
        bos_mask=jnp.asarray(bos),
        rotate_angles=jnp.asarray(angles),
        actor_valid=jnp.asarray(actor_valid),
        agent_index=jnp.asarray(agent_index),
        av_index=jnp.asarray(np.zeros(B, np.int32)),
        source=jnp.asarray(source),
        lane_positions=jnp.asarray(lane_positions),
        lane_paddings=jnp.asarray(lane_paddings),
        lane_valid=jnp.asarray(lane_valid),
    )
