"""TPU: effective batch 256 via gradient accumulation (two stacked
128-scene micro-batches) vs the direct B=256 step (HBM-spills; 182.3 ms
recorded in PERF.md).  Honest on-device-chained protocol.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_accum.py
"""
import time, jax, jax.numpy as jnp, numpy as np, optax
from jax.experimental.compilation_cache import compilation_cache as cc
cc.set_cache_dir("/tmp/jax_cache_trajsde")
jax.config.update("jax_default_prng_impl", "rbg")
from __graft_entry__ import _scene, _build_flagship
from trajsde_tpu.losses import diff_bce_loss, l2_loss
from trajsde_tpu.train.loop import create_train_state, make_train_step

ITERS = 10
model = _build_flagship(dtype=jnp.bfloat16)
s128 = jax.device_put(_scene(batch_size=128, num_actors=32, num_lanes=64))
micro = jax.tree.map(lambda x: jnp.stack([x, x]), s128)  # [2, 128, ...]
opt = optax.adamw(1e-3, weight_decay=7e-4)
state = create_train_state(model, opt, s128)
step = make_train_step(model, opt, [("L2",1.0,l2_loss),("DiffBCE",1.0,diff_bce_loss)],
                       donate=False, accum_steps=2)

@jax.jit
def run(state, scene):
    def body(i, st):
        st, _ = step(st, scene)
        return st
    st = jax.lax.fori_loop(0, ITERS, body, state)
    return st, jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), st.params, 0.0)

st, c = run(state, micro); assert np.isfinite(float(c))
t0 = time.perf_counter(); st, c = run(st, micro); c = float(c)
dt = time.perf_counter() - t0; assert np.isfinite(c)
print(f"accum=2 (eff B=256): {dt/ITERS*1000:.2f} ms/update "
      f"({256*ITERS/dt:.1f} scenes/s) vs direct B=256 182.3 ms (1404/s)")
