"""Worker process for the REAL multi-host test (no ``test_`` prefix — run
via subprocess, not collected by pytest).

Two of these join through ``jax.distributed.initialize`` (localhost
coordinator, CPU devices — the TPU-native analog of testing DDP without a
cluster), build one GLOBAL mesh spanning both processes' devices through
``init_multihost``/``make_mesh``, compute sharded gradients of the baseline
model, and compare them against the process-local single-host gradients.
Matches the capability the reference gets from Lightning DDP
(``/root/reference/train.py:35``).

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir>
"""
import json
import os
import sys

pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax.experimental.compilation_cache import compilation_cache as _cc  # noqa: E402

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))  # repo root

from trajsde_tpu.utils.cache import cpu_cache_dir  # noqa: E402

_cc.set_cache_dir(cpu_cache_dir())  # ISA-keyed: see utils/cache.py
sys.path.insert(0, _here)                   # tests/

import numpy as np  # noqa: E402

from trajsde_tpu.parallel import mesh as mesh_lib  # noqa: E402

n = mesh_lib.init_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert n == nproc, f"init_multihost returned {n}"

from trajsde_tpu.data.synthetic import make_scene_batch  # noqa: E402
from trajsde_tpu.losses import l2_loss  # noqa: E402
from test_models_forward import make_baseline  # noqa: E402

rng = np.random.default_rng(0)
scene = make_scene_batch(rng, batch_size=8, num_actors=6, num_lanes=8, sources=[0, 1])
model = make_baseline()
params = jax.jit(model.init)(jax.random.key(0), scene)["params"]


def loss_fn(p, s):
    out = model.apply({"params": p}, s)
    return l2_loss(out["y"], out)


# single-host reference: local devices only, unsharded
ref_grads = jax.jit(jax.grad(loss_fn))(params, scene)
ref_leaves = [np.asarray(x, np.float64) for x in jax.tree.leaves(ref_grads)]

# global mesh spanning BOTH processes' devices
mesh = mesh_lib.make_mesh(n_data=jax.device_count(), n_model=1)


def to_global(x, sharding):
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


g_scene = jax.tree.map(
    lambda x: to_global(x, mesh_lib.scene_sharding(mesh))
    if hasattr(x, "ndim") and x.ndim
    else x,
    scene,
)
g_params = jax.tree.map(lambda x: to_global(x, mesh_lib.replicated(mesh)), params)

# AOT-compile first, then rendezvous through the coordination service
# (plain KV barrier, no collectives), then execute: local compile times
# skew by minutes on this host (persistent-cache races), and the CPU
# Gloo collective context only allows ~30 s of skew at first execution
compiled = (
    jax.jit(jax.grad(loss_fn), out_shardings=mesh_lib.replicated(mesh))
    .lower(g_params, g_scene)
    .compile()
)
from jax._src import distributed as _dist  # noqa: E402
_dist.global_state.client.wait_at_barrier("compiled", 600_000)
g_grads = compiled(g_params, g_scene)
g_leaves = [np.asarray(x, np.float64) for x in jax.tree.leaves(g_grads)]

maxrel = 0.0
for a, b in zip(ref_leaves, g_leaves):
    scale = max(np.abs(a).max(), 1e-6)
    maxrel = max(maxrel, float(np.abs(a - b).max() / scale))

with open(os.path.join(outdir, f"proc{pid}.json"), "w") as f:
    json.dump(
        {
            "process_count": jax.process_count(),
            "device_count": jax.device_count(),
            "local_device_count": jax.local_device_count(),
            "maxrel": maxrel,
        },
        f,
    )

# rendezvous before exiting: an early-exiting worker would trip the
# coordination-service shutdown barrier in the other process
_dist.global_state.client.wait_at_barrier("done", 600_000)
