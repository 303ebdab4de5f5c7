"""TPU experiment: fused vs linen AA pair chain in the full train step.

Honest protocol (CLAUDE.md): N steps chained on-device in one jitted
fori_loop, timing closed by a checksum value fetch.  Run on the TPU:

    python scripts/bench_fused.py [--iters 20] [--batch 128]
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


def run(fused: bool, batch: int, iters: int, fused_decoder: bool = False) -> float:
    from __graft_entry__ import _build_flagship, _scene
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    model = _build_flagship(dtype=jnp.bfloat16, fused=fused,
                            fused_decoder=fused_decoder)
    scene = jax.device_put(_scene(batch_size=batch, num_actors=32, num_lanes=64))
    optimizer = optax.adamw(1e-3, weight_decay=7e-4)
    state = create_train_state(model, optimizer, scene)
    step = make_train_step(
        model, optimizer,
        [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)],
        donate=False,
    )

    @jax.jit
    def run_steps(state, scene):
        def body(i, st):
            st, _ = step(st, scene)
            return st

        st = jax.lax.fori_loop(0, iters, body, state)
        return st, jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), st.params, 0.0)

    t0 = time.perf_counter()
    state, checksum = run_steps(state, scene)
    assert np.isfinite(float(checksum)), float(checksum)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, checksum = run_steps(state, scene)
    checksum = float(checksum)
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum), checksum
    ms = dt / iters * 1000
    print(
        f"fused={fused} fused_dec={fused_decoder} batch={batch}: "
        f"{ms:.1f} ms/step, "
        f"{batch * iters / dt:.0f} scenes/s (compile+warm {compile_s:.0f}s)",
        flush=True,
    )
    return ms


def run_encoder(
    fused: bool, batch: int, iters: int, rows_bwd: int = 24, rows_fwd: int = 64,
    ln_mm: bool = False,
) -> None:
    """Encoder-only fwd and fwd+bwd timings (isolates the AA stage swap)."""
    from __graft_entry__ import _scene
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    enc = LocalEncoderSDESep(
        historical_steps=21, embed_dim=64, num_heads=8, dtype=jnp.bfloat16,
        fused=fused, rows_bwd=rows_bwd, rows_fwd=rows_fwd, ln_mm=ln_mm,
    )
    scene = jax.device_put(_scene(batch_size=batch, num_actors=32, num_lanes=64))
    params = enc.init({"params": jax.random.key(0), "sde": jax.random.key(1)}, scene)[
        "params"
    ]

    def fwd_loss(p, key):
        out = enc.apply(
            {"params": p}, scene, False,
            rngs={"sde": key, "dropout": jax.random.fold_in(key, 9)},
        )
        return jnp.sum(out[0]) + jnp.sum(out[1]) + jnp.sum(out[2])

    def timed(fn, tag):
        @jax.jit
        def loop(p):
            def body(i, acc):
                return acc + fn(p, jax.random.fold_in(jax.random.key(3), i))

            return jax.lax.fori_loop(0, iters, body, 0.0)

        v = float(loop(params))  # compile+warm
        t0 = time.perf_counter()
        v = float(loop(params))
        dt = time.perf_counter() - t0
        assert np.isfinite(v)
        print(
            f"  fused={fused} rf={rows_fwd} rb={rows_bwd} lnmm={ln_mm} {tag}: "
            f"{dt / iters * 1000:.2f} ms",
            flush=True,
        )

    def fwd_bwd(p, k):
        # checksum must consume the grads or XLA DCEs the whole backward
        v, g = jax.value_and_grad(fwd_loss)(p, k)
        return v + jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), g, 0.0)

    timed(fwd_loss, "enc fwd     ")
    timed(fwd_bwd, "enc fwd+bwd ")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--rows-bwd", type=int, default=24)
    p.add_argument("--rows-fwd", type=int, default=64)
    p.add_argument("--ln-mm", action="store_true")
    p.add_argument(
        "--mode",
        choices=["both", "fused", "linen", "enc", "enc-fused", "enc-linen",
                 "dec-fused", "all-fused"],
        default="both",
    )
    args = p.parse_args()
    jax.config.update("jax_default_prng_impl", "rbg")
    print("devices:", jax.devices(), flush=True)
    if args.mode in ("both", "fused"):
        run(True, args.batch, args.iters)
    if args.mode in ("both", "linen"):
        run(False, args.batch, args.iters)
    if args.mode == "dec-fused":  # fused rollout, linen encoder
        run(False, args.batch, args.iters, fused_decoder=True)
    if args.mode == "all-fused":
        run(True, args.batch, args.iters, fused_decoder=True)
    if args.mode in ("enc", "enc-fused"):
        run_encoder(True, args.batch, args.iters, args.rows_bwd, args.rows_fwd,
                    args.ln_mm)
    if args.mode in ("enc", "enc-linen"):
        run_encoder(False, args.batch, args.iters, args.rows_bwd, args.rows_fwd)
