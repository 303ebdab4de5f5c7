"""Dense, statically-shaped scene batches.

``SceneBatch`` is the TPU-native analog of the reference's ragged
PyG ``TemporalData`` container (reference: ``models/utils/util.py:21-75``).
Instead of concatenating variable-size scenes into one big graph with
edge-index offsets, every scene is padded to a fixed actor count ``A`` and
lane count ``L`` so that XLA sees a single static shape per bucket.

Conventions (all shapes static):
  B  — scenes per batch            A  — padded actors per scene
  Th — historical steps (21)       Tf — future steps (60)
  L  — padded lane segments        S  — poses per lane segment (10)

Masks follow the reference convention: ``padding_mask`` is True where a
time step is INVALID; ``*_valid`` flags are True where a slot is USED.

All geometric quantities live in the shared AV-centered scene frame.
Per the reference runtime (``dataset/nuScenes_Argoverse/nuScenes_Argoverse.py:161``),
only the displacement features ``x`` (and delta-mode ``y``) carry the ÷5
nuScenes coordinate scaling — ``positions`` / lanes stay in meters.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SceneBatch:
    """A dense batch of traffic scenes.

    Dense analog of the reference ``TemporalData``
    (``models/utils/util.py:21-75``): same information content, fixed shapes.
    """

    # --- actors -----------------------------------------------------------
    x: jax.Array               # [B, A, Th, 2] float — displacement features
    positions: jax.Array       # [B, A, Th+Tf, 2] float — absolute positions
    padding_mask: jax.Array    # [B, A, Th+Tf] bool — True where INVALID
    bos_mask: jax.Array        # [B, A, Th] bool — True at first valid step
    rotate_angles: jax.Array   # [B, A] float — per-actor heading
    actor_valid: jax.Array     # [B, A] bool — slot is a real actor
    agent_index: jax.Array     # [B] int32 — focal agent slot
    av_index: jax.Array        # [B] int32 — AV slot
    source: jax.Array          # [B] int32 — 0 = nuScenes, 1 = Argoverse
    y: Optional[jax.Array] = None  # [B, A, Tf, 2] float — future targets

    # --- lanes ------------------------------------------------------------
    lane_positions: Optional[jax.Array] = None  # [B, L, S, 2] float
    lane_paddings: Optional[jax.Array] = None   # [B, L, S] bool — True = padded pose
    lane_valid: Optional[jax.Array] = None      # [B, L] bool

    # --- optional parity extras -------------------------------------------
    goal_idcs: Optional[jax.Array] = None   # [B, A, L] float one-hot goal lane
    has_goal: Optional[jax.Array] = None    # [B, A] bool
    seq_id: Optional[jax.Array] = None      # [B] int32

    # ----------------------------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.x.shape[0]

    @property
    def num_actors(self) -> int:
        return self.x.shape[1]

    @property
    def historical_steps(self) -> int:
        return self.x.shape[2]

    @property
    def future_steps(self) -> int:
        return self.padding_mask.shape[2] - self.x.shape[2]

    @property
    def num_lanes(self) -> int:
        return 0 if self.lane_positions is None else self.lane_positions.shape[1]

    def rotate_mat(self) -> jax.Array:
        """Per-actor 2x2 rotation matrices, [B, A, 2, 2].

        Same layout as the reference (``models/model_base_mix.py:76-83``):
        ``[[cos, -sin], [sin, cos]]`` built from ``rotate_angles``;
        vectors are rotated with the row-vector convention
        ``v' = einsum('...j,...ji->...i', v, R)``.
        """
        c = jnp.cos(self.rotate_angles)
        s = jnp.sin(self.rotate_angles)
        row0 = jnp.stack([c, -s], axis=-1)
        row1 = jnp.stack([s, c], axis=-1)
        return jnp.stack([row0, row1], axis=-2)


def rotate_into(v: jax.Array, rot: jax.Array) -> jax.Array:
    """Rotate 2-vectors ``v`` by matrices ``rot`` (row-vector convention).

    Mirrors the reference's ``torch.bmm(v.unsqueeze(-2), R).squeeze(-2)``
    pattern used everywhere rotation-invariance is applied
    (e.g. ``models/encoders/enc_hivt_nusargo_grid.py:162,185-186``).
    """
    return jnp.einsum("...j,...ji->...i", v, rot)
