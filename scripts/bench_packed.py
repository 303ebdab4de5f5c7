"""TPU experiment: horizontally packed SDE-step matmuls (hstack layer-0 +
block-diagonal deeper layers) vs per-layer nn.Dense.

The per-step MLPs are D=64-wide — each matmul pads half of a 128-wide MXU
tile.  Packing f+g (decoder) / f+g_nus+g_argo (encoder) plus the GRU
update+reset gates gets 2-3 matmuls for the price of one, with exactly
the same math (tests/test_packed_parity.py).  Honest protocol per
PERF.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_packed.py
"""
from __future__ import annotations

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

BATCH, ACTORS, LANES = 128, 32, 64
ITERS = 20


def build(packed: bool):
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import SDEDecoder
    from trajsde_tpu.models.prediction import PredictionModelSDENet
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    D, TH, TF = 64, 21, 60
    return PredictionModelSDENet(
        encoder=LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8,
            dtype=jnp.bfloat16, packed=packed,
        ),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=10, num_heads=8,
            dtype=jnp.bfloat16,
        ),
        decoder=SDEDecoder(
            local_channels=D, global_channels=D, future_steps=TF,
            num_modes=10, dtype=jnp.bfloat16, packed=packed,
        ),
    )


def main() -> None:
    jax.config.update("jax_default_prng_impl", "rbg")
    from __graft_entry__ import _scene
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    scene = jax.device_put(_scene(batch_size=BATCH, num_actors=ACTORS, num_lanes=LANES))
    optimizer = optax.adamw(1e-3, weight_decay=7e-4)

    for packed in (False, True):
        model = build(packed)
        state = create_train_state(model, optimizer, scene)
        step = make_train_step(
            model, optimizer,
            [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)],
            donate=False,
        )

        @jax.jit
        def run_steps(state, scene, step=step):
            def body(i, st):
                st, _ = step(st, scene)
                return st
            st = jax.lax.fori_loop(0, ITERS, body, state)
            return st, jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), st.params, 0.0
            )

        t_c0 = time.perf_counter()
        st, checksum = run_steps(state, scene)
        assert np.isfinite(float(checksum))
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        st, checksum = run_steps(state, scene)
        checksum = float(checksum)
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        print(
            f"packed={packed!s:5}: {dt / ITERS * 1000:7.2f} ms/step "
            f"({BATCH * ITERS / dt:8.1f} scenes/s)  compile+warm {compile_s:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
