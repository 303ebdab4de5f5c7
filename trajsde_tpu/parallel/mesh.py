"""Device mesh and sharding specs — the framework's communication backend.

The reference gets its distribution for free from Lightning DDP over NCCL
(``train.py:35``, SURVEY §2.9).  The TPU-native equivalent is explicit:
a ``jax.sharding.Mesh`` with a ``data`` axis (scenes) and a ``model``
axis (prediction modes / OOD ensemble members), batch arrays sharded by
``NamedSharding``, parameters replicated, and XLA inserting ``psum`` /
``all_gather`` collectives over ICI.  Multi-host DCN slices initialize via
``jax.distributed.initialize`` before calling :func:`make_mesh`.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host (DCN) distribution; returns the process count.

    The NCCL/DDP analog (SURVEY §2.9): after this, ``jax.devices()`` spans
    every host's chips and :func:`make_mesh` builds a global mesh whose
    gradient ``psum`` rides ICI within a slice and DCN across slices.
    Single-process runs (``num_processes`` absent or 1, and no coordinator)
    are a no-op so the same entry point works everywhere.
    """
    import os

    num = num_processes if num_processes is not None else int(
        os.environ.get("TRAJSDE_NUM_PROCESSES", "1")
    )
    addr = coordinator_address or os.environ.get("TRAJSDE_COORDINATOR")
    if num <= 1 and not addr:
        return 1
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("TRAJSDE_PROCESS_ID", "0")),
    )
    return jax.process_count()


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    """Create a 2-D (data, model) mesh over the available devices.

    ``n_model`` shards the mode/ensemble axes (kept 1 for the headline
    configs — the model is 64-dim, so data parallelism dominates); ICI
    ordering is preserved by keeping the fastest-varying axis innermost.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    assert n_data * n_model == devices.size, (
        f"mesh {n_data}x{n_model} != {devices.size} devices"
    )
    return Mesh(devices.reshape(n_data, n_model), (DATA_AXIS, MODEL_AXIS))


def make_mesh_for_batch(batch_size: int, n_model: int = 1, devices=None) -> Mesh:
    """Data-parallel mesh using the largest device count dividing the batch.

    Keeps small debug batches runnable on large hosts: surplus devices are
    left OUT of the mesh and idle (single-process only — a mesh must span
    every process's devices in a multi-process run, so a non-divisible
    batch there is a config error, reported loudly).
    """
    devices = list(devices if devices is not None else jax.devices())
    n_avail = max(1, len(devices) // n_model)
    # largest divisor of the batch that fits the device count (gcd would
    # under-use devices: batch 12 on 8 devices → gcd 4, divisor 6)
    n_data = max(d for d in range(1, min(batch_size, n_avail) + 1)
                 if batch_size % d == 0)
    if jax.process_count() > 1 and n_data * n_model < len(devices):
        raise ValueError(
            f"batch size {batch_size} uses only {n_data * n_model} of "
            f"{len(devices)} global devices; a multi-process mesh must "
            "cover every process's devices — pick a batch size divisible "
            f"by {len(devices) // n_model} (or reduce processes)"
        )
    return make_mesh(n_data=n_data, n_model=n_model, devices=devices[: n_data * n_model])


def scene_sharding(mesh: Mesh) -> NamedSharding:
    """Batch arrays: leading (scene) axis over the data axis, rest local."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def mode_sharding(mesh: Mesh) -> NamedSharding:
    """[B, F, ...] activations: scenes over data, modes over model."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def shard_batch(batch, mesh: Mesh, batch_axis: int = 0):
    """Place every array of a SceneBatch pytree with batch-dim sharding.

    ``batch_axis=1`` handles gradient-accumulation groups ``[K, B, ...]``:
    the leading micro axis is scanned locally, the scene axis shards over
    ``data``.  A ragged batch (scene axis not divisible by the data axis)
    falls back to replication — correct, just not parallel.
    """
    leaves = [
        x for x in jax.tree.leaves(batch)
        if hasattr(x, "shape") and x.ndim > batch_axis
    ]
    n_data = mesh.shape[DATA_AXIS]
    divisible = all(x.shape[batch_axis] % n_data == 0 for x in leaves)
    if not divisible:
        sharding = replicated(mesh)
    elif batch_axis == 0:
        sharding = scene_sharding(mesh)
    else:
        sharding = NamedSharding(mesh, P(*([None] * batch_axis), DATA_AXIS))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") and x.ndim else x,
        batch,
    )


def _first_divisible_axis(shape, n: int) -> Optional[int]:
    for i, d in enumerate(shape):
        if d % n == 0 and d >= n:
            return i
    return None


def zero1_sharding(leaf, mesh: Mesh) -> NamedSharding:
    """ZeRO-1 layout for one optimizer-state tensor: partition the first
    axis divisible by the data-axis size; replicate otherwise."""
    n = mesh.shape[DATA_AXIS]
    ax = _first_divisible_axis(getattr(leaf, "shape", ()), n)
    if ax is None:
        return replicated(mesh)
    spec = [None] * leaf.ndim
    spec[ax] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_opt_state(opt_state, mesh: Mesh):
    """ZeRO-1: shard the optimizer state (Adam moments etc.) over ``data``.

    The reference replicates optimizer state per DDP rank (Lightning/NCCL,
    SURVEY §2.9); here each data-parallel shard owns a slice of the
    moments.  Under ``jit`` the SPMD partitioner then emits the
    reduce-scatter (grads → owned slice), sharded update, and all-gather
    (updated params → replicas) — the ZeRO-1 schedule — from the layouts
    alone.  Params stay replicated, so the model code is untouched and
    checkpoints are layout-independent (orbax reads/writes logical arrays).

    Per-device optimizer memory drops ~(n_data−1)/n_data of the moment
    storage (2× params for Adam).
    """
    shardings = jax.tree.map(
        lambda x: zero1_sharding(x, mesh)
        if hasattr(x, "shape") and getattr(x, "ndim", 0)
        else replicated(mesh),
        opt_state,
    )
    # one batched transfer for the whole tree (vs a dispatch per leaf)
    return jax.device_put(opt_state, shardings)


def constrain_modes(x, mesh: Mesh):
    """Annotate a [B, F, ...] activation so XLA shards modes over ``model``."""
    ndim = x.ndim
    spec = P(DATA_AXIS, MODEL_AXIS, *([None] * (ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
