"""Wire-format batches: one host→device buffer per dtype.

A stripped production ``SceneBatch`` is ~15 separate arrays.  On this
environment's relayed TPU backend every pytree leaf of a
``jax.device_put`` is its own transfer RPC, so the per-leaf round-trip
overhead — not just the payload bytes — rides the e2e step time (PERF.md
round 4 "Wire-format transfer packing": after ``strip_for_device`` the
residual transfer cost is ~21 ms/step over the 167 ms device step; the
63 ms figure sometimes quoted is the PRE-strip number and is stale).
Real PCIe-attached TPU hosts have the
same shape of cost at a smaller constant (one DMA setup per leaf).

``pack_wire`` concatenates every populated field onto the trailing axis
of ONE flat buffer per dtype, host-side in numpy (a single memcpy pass),
preserving the leading ``[chain,][micro,] B`` group axes so the packed
batch remains scannable and data-parallel-shardable along axis 0.
``unpack_wire`` is traceable and runs INSIDE the jitted step: static
slices + reshapes that XLA lowers to at-worst one HBM copy (~10 µs for a
7.5 MiB batch) — the relayout happens at HBM bandwidth instead of wire
bandwidth.  Exact by construction: bytes are moved, never converted.

The reference has no analog — its CUDA path inherits pinned-memory
batching from the PyG collate (``dataset/Datamodule_nuargo_mix.py:33-44``);
this is the TPU-native replacement for that transfer-path tuning.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import struct

from trajsde_tpu.data.scene import SceneBatch

# fields are packed in this fixed order; x MUST stay first (its ndim
# defines how many leading group axes the batch carries — SceneBatch's
# canonical x is [B, A, Th, 2], 4 axes).  The scene axis B itself stays a
# leading buffer axis (buffers are [*groups, B, per_scene]) so a wire
# batch scans over group axes and data-parallel-shards along B exactly
# like the unpacked batch.
_X_NDIM = 4
_FIELDS: Tuple[str, ...] = (
    "x",
    "positions",
    "padding_mask",
    "bos_mask",
    "rotate_angles",
    "actor_valid",
    "agent_index",
    "av_index",
    "source",
    "y",
    "lane_positions",
    "lane_paddings",
    "lane_valid",
    "goal_idcs",
    "has_goal",
    "seq_id",
)

# Schema-drift guard: pack_wire packs exactly _FIELDS, so a field added to
# SceneBatch but not listed here would be silently dropped on pack and
# rebuilt as None on unpack — breaking the "exact by construction"
# contract without any error.  Fail loudly at import time instead —
# an explicit raise, not `assert`, so `python -O` cannot strip the guard.
if set(_FIELDS) != set(SceneBatch.__dataclass_fields__):
    raise RuntimeError(
        "data/wire.py _FIELDS is out of sync with SceneBatch: "
        f"missing={set(SceneBatch.__dataclass_fields__) - set(_FIELDS)} "
        f"extra={set(_FIELDS) - set(SceneBatch.__dataclass_fields__)}"
    )


@struct.dataclass
class WireBatch:
    """A ``SceneBatch`` packed into one flat buffer per dtype.

    ``bufs`` maps dtype name → ``[*lead, total]`` array; ``inline``
    holds fields left at their native shapes (see ``inline_min_bytes``);
    ``spec`` is static pytree metadata (hashable → one executable per
    batch format):
    ``(n_lead, ((field, dtype_name, offset, size, shape_after_lead), …))``
    where ``dtype_name is None`` marks an inline field.
    """

    bufs: Dict[str, jax.Array]
    inline: Dict[str, jax.Array]
    spec: Tuple[int, Tuple[tuple, ...]] = struct.field(pytree_node=False)

    @property
    def lead_shape(self) -> Tuple[int, ...]:
        """The ``[*groups, B]`` leading axes shared by every array.

        Derived from runtime shapes (NOT ``spec``'s pack-time lead count):
        host-side ``np.stack`` grouping adds lead axes without re-packing,
        and this property must follow them."""
        if self.bufs:
            return next(iter(self.bufs.values())).shape[:-1]
        _, entries = self.spec
        name, _, _, _, shape = next(e for e in entries if e[1] is None)
        arr = self.inline[name]
        return arr.shape[: arr.ndim - len(shape)]


def pack_wire(batch: SceneBatch, inline_min_bytes: int = 0) -> WireBatch:
    """Pack a host (numpy) ``SceneBatch`` into per-dtype wire buffers.

    ``inline_min_bytes > 0`` leaves fields of at least that many bytes
    at their native shapes (their own transfer already amortizes the
    per-RPC cost) and packs only the long tail of small arrays — that
    keeps the host-side memcpy pass to ~1/8 of the batch while still
    collapsing most of the transfer round trips.
    """
    n_lead = batch.x.ndim - _X_NDIM + 1  # group axes + the scene axis B
    lead = batch.x.shape[:n_lead]
    chunks: Dict[str, list] = {}
    offsets: Dict[str, int] = {}
    inline: Dict[str, Any] = {}
    entries = []
    for name in _FIELDS:
        arr = getattr(batch, name)
        if arr is None:
            continue
        arr = np.asarray(arr)
        if inline_min_bytes and arr.nbytes >= inline_min_bytes:
            inline[name] = arr
            entries.append((name, None, 0, 0, arr.shape[n_lead:]))
            continue
        key = arr.dtype.name
        flat = arr.reshape(*lead, -1)
        off = offsets.get(key, 0)
        entries.append((name, key, off, flat.shape[-1], arr.shape[n_lead:]))
        offsets[key] = off + flat.shape[-1]
        chunks.setdefault(key, []).append(flat)
    bufs = {
        k: (v[0] if len(v) == 1 else np.concatenate(v, axis=-1))
        for k, v in chunks.items()
    }
    return WireBatch(bufs=bufs, inline=inline, spec=(n_lead, tuple(entries)))


def unpack_wire(wire: WireBatch) -> SceneBatch:
    """Rebuild the ``SceneBatch`` from wire buffers (traceable)."""
    n_lead, entries = wire.spec
    fields: Dict[str, Any] = {}
    for name, key, off, size, shape in entries:
        if key is None:
            fields[name] = wire.inline[name]
            continue
        buf = wire.bufs[key]
        flat = jax.lax.slice_in_dim(buf, off, off + size, axis=buf.ndim - 1)
        fields[name] = flat.reshape(*buf.shape[:-1], *shape)
    return SceneBatch(**fields)


def unpack_if_wire(scene):
    """In-trace dispatch: wire batches relayout to field shapes, plain
    ``SceneBatch``es pass through untouched."""
    return unpack_wire(scene) if isinstance(scene, WireBatch) else scene
