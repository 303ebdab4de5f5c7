"""On-device derivation of dense attention masks from a SceneBatch.

The reference builds ragged edge lists at runtime (per-timestep
``subgraph`` + ``DistanceDropEdge``, ``models/encoders/enc_hivt_nusargo_grid.py:58-65``;
lane-actor pairs preprocessed with a directional window,
``dataset/Argoverse/Argoverse_abs.py:433-437``, then distance-filtered at
runtime, ``enc_hivt_nusargo_grid.py:80``).  Here every edge set becomes a
boolean mask over a fixed-shape dense adjacency, computed inside ``jit``
from raw geometry — cheap elementwise work that XLA fuses away.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from trajsde_tpu.data.scene import SceneBatch, rotate_into


def aa_masks(scene: SceneBatch, local_radius: float) -> jax.Array:
    """Agent-agent adjacency per historical step: [B, Th, A, A] bool.

    ``out[b, t, i, j]`` is True iff actor ``j`` sends a message to actor
    ``i`` at step ``t``.  Matches the reference per-step edge construction:
    both endpoints valid at ``t`` (``subgraph(~padding_mask[:, t])``),
    no self loops (preprocessing uses ``permutations``,
    ``Argoverse_abs.py:201``), and strict ``dist < local_radius``
    (``models/utils/util.py:89``).
    """
    Th = scene.historical_steps
    valid = (~scene.padding_mask[:, :, :Th]) & scene.actor_valid[:, :, None]
    valid = jnp.transpose(valid, (0, 2, 1))                       # [B, Th, A]
    pos = jnp.transpose(scene.positions[:, :, :Th], (0, 2, 1, 3))  # [B, Th, A, 2]
    diff = pos[:, :, None, :, :] - pos[:, :, :, None, :]           # [.., i, j]: p_j - p_i? see below
    # edge_attr in the reference is positions[src] - positions[dst]
    # (enc_hivt_nusargo_grid.py:60-61); distances are symmetric so the mask
    # does not depend on orientation.
    dist2 = jnp.sum(diff * diff, axis=-1)
    A = valid.shape[-1]
    not_self = ~jnp.eye(A, dtype=bool)
    mask = (
        valid[:, :, :, None]
        & valid[:, :, None, :]
        & not_self[None, None]
        & (dist2 < local_radius * local_radius)
    )
    return mask


def aa_edge_vectors(scene: SceneBatch) -> jax.Array:
    """Per-pair edge vectors per step: [B, Th, A(recv i), A(send j), 2].

    ``vec[b, t, i, j] = positions[j, t] - positions[i, t]`` — the reference's
    ``edge_attr`` with receiver convention ``edge_index = (src j → dst i)``
    (``enc_hivt_nusargo_grid.py:60-61``).
    """
    Th = scene.historical_steps
    pos = jnp.transpose(scene.positions[:, :, :Th], (0, 2, 1, 3))  # [B, Th, A, 2]
    return pos[:, :, None, :, :] - pos[:, :, :, None, :]


def al_edges(
    scene: SceneBatch,
    ref_time: int,
    local_radius: float,
    lon_window: tuple = (-20.0, 80.0),
    lat_window: float = 50.0,
) -> tuple:
    """Actor-lane adjacency + edge vectors: ([B, A, L] bool, [B, A, L, 2]).

    Reproduces the preprocessing window filter
    (``Argoverse_abs.py:421-437``): edge vector = lane segment END pose −
    actor position at the reference step (scene frame); kept iff the vector
    rotated into the ACTOR frame satisfies −20 < lon < 80 and |lat| < 50,
    the actor is valid at the reference step, and (runtime
    ``DistanceDropEdge``) ‖vec‖ < local_radius.
    """
    lane_end = _lane_end(scene)                                    # [B, L, 2]

    actor_pos = scene.positions[:, :, ref_time]                    # [B, A, 2]
    vec = lane_end[:, None, :, :] - actor_pos[:, :, None, :]       # [B, A, L, 2]

    rot = scene.rotate_mat()                                       # [B, A, 2, 2]
    vec_local = rotate_into(vec, rot[:, :, None])                  # [B, A, L, 2]
    window = (
        (vec_local[..., 0] > lon_window[0])
        & (vec_local[..., 0] < lon_window[1])
        & (vec_local[..., 1] > -lat_window)
        & (vec_local[..., 1] < lat_window)
    )
    dist2 = jnp.sum(vec * vec, axis=-1)
    actor_ref_valid = (~scene.padding_mask[:, :, ref_time]) & scene.actor_valid
    mask = (
        window
        & (dist2 < local_radius * local_radius)
        & actor_ref_valid[:, :, None]
        & scene.lane_valid[:, None, :]
    )
    return mask, vec


def _lane_end(scene: SceneBatch) -> jax.Array:
    """Last VALID pose of each padded lane polyline, [B, L, 2]."""
    lane_len = jnp.sum(~scene.lane_paddings, axis=-1)              # [B, L]
    last = jnp.clip(lane_len - 1, 0, scene.lane_positions.shape[2] - 1)
    return jnp.take_along_axis(
        scene.lane_positions, last[:, :, None, None].astype(jnp.int32), axis=2
    )[:, :, 0, :]


def lane_features(scene: SceneBatch) -> jax.Array:
    """Lane feature = end pose − start pose of each segment, [B, L, 2].

    Matches ``enc_hivt_nusargo_grid.py:82-85`` (endpoint-minus-startpoint of
    the padded lane polyline).
    """
    return _lane_end(scene) - scene.lane_positions[:, :, 0]


def global_edges(scene: SceneBatch, ref_time: int) -> tuple:
    """Global-interaction adjacency at the reference step.

    Returns (mask [B, A, A], rel_pos [B, A, A, 2], rel_theta [B, A, A]).
    Matches ``models/aggregators/agg_hivt.py:41-51``: subgraph of actors
    valid at the reference step (NO distance cutoff), rel_pos =
    positions[src j] − positions[dst i], rel_theta = angles[j] − angles[i].
    """
    valid = (~scene.padding_mask[:, :, ref_time]) & scene.actor_valid
    A = valid.shape[-1]
    not_self = ~jnp.eye(A, dtype=bool)
    mask = valid[:, :, None] & valid[:, None, :] & not_self[None]
    pos = scene.positions[:, :, ref_time]
    rel_pos = pos[:, None, :, :] - pos[:, :, None, :]              # [b, i, j]
    rel_theta = scene.rotate_angles[:, None, :] - scene.rotate_angles[:, :, None]
    return mask, rel_pos, rel_theta
