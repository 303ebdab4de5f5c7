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


def strip_for_device(batch: "SceneBatch") -> "SceneBatch":
    """Shed wire bytes no jitted consumer reads, before host→device transfer.

    Two fields of the ``TemporalData``-parity contract are dead weight on
    the training/eval hot path (they exist for preprocessing parity,
    submissions and host-side viz — no model, loss, metric or serving
    projection touches them on device):

    - ``goal_idcs`` ``[B, A, L]`` float one-hot + ``has_goal``: ~30% of a
      real preprocessed batch's payload (4.5 MiB at B=128/A=48/L=192);
      consumed by nothing under jit (the reference likewise only stores
      them, ``models/utils/util.py:21-75``).
    - ``positions[..., Th:, :]``: every device consumer slices
      ``[:, :, :Th]`` or indexes ``ref_time < Th`` (``models/graph.py``,
      ``server.py`` world projection); the future 60 of 81 steps
      (2.8 of 3.8 MiB at production shape) never leave the host's use
      (targets live in ``y``).

    Exact by construction — it removes bytes, not precision.  Handles
    leading group axes (``[chain,][micro,] B``) by truncating the
    second-to-last positions axis to ``x``'s step count.  Idempotent, so
    double application (CLI generator + ``device_prefetch``) is free; the
    caller must apply it host-side (slicing a device array here would be
    an eager relay round trip on this backend).
    """
    th = batch.x.shape[-2]
    pos = batch.positions
    truncate = pos is not None and pos.shape[-2] != th
    if not truncate and batch.goal_idcs is None and batch.has_goal is None:
        return batch
    return batch.replace(
        positions=pos[..., :th, :] if truncate else pos,
        goal_idcs=None,
        has_goal=None,
    )


def rotate_into(v: jax.Array, rot: jax.Array) -> jax.Array:
    """Rotate 2-vectors ``v`` by matrices ``rot`` (row-vector convention).

    Mirrors the reference's ``torch.bmm(v.unsqueeze(-2), R).squeeze(-2)``
    pattern used everywhere rotation-invariance is applied
    (e.g. ``models/encoders/enc_hivt_nusargo_grid.py:162,185-186``).
    """
    return jnp.einsum("...j,...ji->...i", v, rot)
