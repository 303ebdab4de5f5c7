"""B=128 vs B=256 train-step scaling + compiled memory analysis.

Explains (or fixes) the round-1 finding that per-scene throughput regresses
at B=256 (PERF.md).  Usage: python scripts/bench_batch.py [--remat]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.set_cache_dir("/tmp/jax_cache_trajsde")
except Exception:
    pass


def run(batch: int, iters: int, remat: bool) -> None:
    from __graft_entry__ import _scene
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import SDEDecoder
    from trajsde_tpu.models.prediction import PredictionModelSDENet
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    D, TH, TF = 64, 21, 60
    model = PredictionModelSDENet(
        encoder=LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8,
            dtype=jnp.bfloat16, remat=remat,
        ),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=10, num_heads=8,
            dtype=jnp.bfloat16,
        ),
        decoder=SDEDecoder(
            local_channels=D, global_channels=D, future_steps=TF,
            num_modes=10, dtype=jnp.bfloat16,
        ),
    )
    scene = jax.device_put(_scene(batch_size=batch, num_actors=32, num_lanes=64))
    optimizer = optax.adamw(1e-3, weight_decay=7e-4)
    state = create_train_state(model, optimizer, scene)
    step = make_train_step(
        model, optimizer,
        [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)], donate=False,
    )

    @jax.jit
    def run_steps(state, scene):
        def body(i, st):
            st, _ = step(st, scene)
            return st

        st = jax.lax.fori_loop(0, iters, body, state)
        return st, jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), st.params, 0.0)

    compiled = run_steps.lower(state, scene).compile()
    mem = compiled.memory_analysis()
    temp = getattr(mem, "temp_size_in_bytes", 0)
    args_sz = getattr(mem, "argument_size_in_bytes", 0)
    print(
        f"B={batch} remat={remat}: temp {temp / 2**20:.0f} MiB, "
        f"args {args_sz / 2**20:.0f} MiB",
        flush=True,
    )
    state, checksum = run_steps(state, scene)
    assert np.isfinite(float(checksum))
    t0 = time.perf_counter()
    state, checksum = run_steps(state, scene)
    float(checksum)
    dt = time.perf_counter() - t0
    print(
        f"B={batch} remat={remat}: {dt / iters * 1000:.1f} ms/step, "
        f"{batch * iters / dt:.0f} scenes/s",
        flush=True,
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--batches", type=int, nargs="+", default=[128, 256])
    args = p.parse_args()
    jax.config.update("jax_default_prng_impl", "rbg")
    for b in args.batches:
        run(b, args.iters, args.remat)
