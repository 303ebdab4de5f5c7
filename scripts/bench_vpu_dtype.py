"""Micro-probe: Mosaic VPU elementwise throughput, f32 vs bf16.

Decides whether a bf16 spine in the fused AA kernel can halve its
VPU-bound forward (packed 2-per-lane bf16) or not.  One kernel, N chained
(tanh → mul → add) rounds on a [rows, 128] tile; honest on-device timing.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.set_cache_dir("/tmp/jax_cache_trajsde")
except Exception:
    pass

ROUNDS = 64


def _kernel(x_ref, o_ref):
    x = x_ref[:]
    for _ in range(ROUNDS):
        x = jnp.tanh(x) * x + x
    o_ref[:] = x


def run(dtype, rows=2048, reps=200):
    x = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (rows, 128)), dtype)

    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 128), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def loop(x):
        def body(i, acc):
            return acc + jnp.sum(fn(x).astype(jnp.float32))

        return jax.lax.fori_loop(0, reps, body, 0.0)

    v = float(loop(x))
    t0 = time.perf_counter()
    v = float(loop(x))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    elems = rows * 128 * ROUNDS * reps
    print(
        f"{jnp.dtype(dtype).name:9s}: {dt / reps * 1e6:8.1f} us/call  "
        f"{elems / dt / 1e12:.2f} T(tanh·mul·add)/s",
        flush=True,
    )


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run(jnp.float32)
    run(jnp.bfloat16)
