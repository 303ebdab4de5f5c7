"""MFU vs model width: is the 2.2% headline MFU the framework or the model?

The reference architecture fixes embed_dim=64 (configs/*: ``embed_dim:
64``), far below the v5e MXU tile (128x128) — the SOL audit (PERF.md
"Speed-of-light audit") shows the parity model runs AT the HBM roofline,
so its MFU ceiling is set by arithmetic intensity, not by this framework.
This bench quantifies that: the SAME flagship composition at embed_dim
64 / 128 / 256 (bf16, bench shape), full train step, MFU from the
compiled executable's own cost analysis.  If MFU climbs steeply with
width, the low headline number is a property of the tiny reference
model; the framework's compute path scales onto the MXU as designed.

Timing protocol: on-device chained fori_loop + value fetch (CLAUDE.md
"TPU microbenchmarks lie").  Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_width.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.set_cache_dir("/tmp/jax_cache_trajsde")
except Exception:
    pass

RESULTS = {}
SHAPES = {"bench": (128, 32, 64), "iters": 20}
PEAK_BF16 = 394e12  # v5e


def report(key, value):
    RESULTS[key] = value
    print(f"{key}: {value}", flush=True)


def build_flagship_width(embed_dim: int, dtype=jnp.bfloat16):
    """The flagship SDE composition at a configurable width (the parity
    model is the embed_dim=64 row; wider rows share every code path)."""
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import SDEDecoder
    from trajsde_tpu.models.prediction import PredictionModelSDENet
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

    D, TH, TF = embed_dim, 21, 60
    return PredictionModelSDENet(
        encoder=LocalEncoderSDESep(
            historical_steps=TH, embed_dim=D, num_heads=8, dtype=dtype
        ),
        aggregator=GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=10, num_heads=8,
            dtype=dtype,
        ),
        decoder=SDEDecoder(
            local_channels=D, global_channels=D, future_steps=TF,
            num_modes=10, dtype=dtype,
        ),
    )


def measure(model, scene, iters, tag):
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    opt = optax.adamw(1e-3, weight_decay=7e-4)
    state = create_train_state(model, opt, scene)
    step = make_train_step(
        model, opt, [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)],
        donate=False,
    )

    @jax.jit
    def run(state, scene):
        def body(i, st):
            st, _ = step(st, scene)
            return st
        st = jax.lax.fori_loop(0, iters, body, state)
        return st, jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), st.params, 0.0
        )

    # cost analysis must target ONE step: XLA does not multiply fori_loop
    # trip counts, so lowering `run` would understate FLOPs by ITERS
    # (bench.py does the same — VERDICT r1 item 3 methodology)
    step_cost = jax.jit(step).lower(state, scene).compile().cost_analysis() or {}
    flops = float(step_cost.get("flops", float("nan"))) * iters

    lowered = run.lower(state, scene)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    temp_mib = getattr(mem, "temp_size_in_bytes", 0) / 2**20

    st, v = compiled(state, scene)
    v = float(v)
    assert np.isfinite(v), f"{tag}: non-finite checksum"
    t0 = time.perf_counter()
    st, v = compiled(state, scene)
    v = float(v)
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    return dt / iters * 1000, flops / dt, temp_mib


def part_width():
    from __graft_entry__ import _scene

    b0, a, l = SHAPES["bench"]
    for D in (64, 128, 256):
        # wider activations can overflow HBM / the remote compile helper
        # at full batch; fall back to smaller batches so the MFU-vs-width
        # trend is still measured (MFU is per-FLOP, batch-comparable)
        for b in (b0, b0 // 2, b0 // 4):
            try:
                scene = jax.device_put(_scene(b, a, l))
                model = build_flagship_width(D)
                ms, flops_per_s, temp_mib = measure(
                    model, scene, SHAPES["iters"], tag=f"D{D}/B{b}"
                )
                report(f"width/D{D}", {
                    "batch": b,
                    "ms_per_step": round(ms, 2),
                    "scenes_per_s": round(b * 1000.0 / ms, 1),
                    "achieved_tflops": round(flops_per_s / 1e12, 2),
                    "mfu": round(flops_per_s / PEAK_BF16, 4),
                    "temp_MiB": round(temp_mib, 1),
                })
                break
            except Exception as e:  # OOM etc. — record honestly
                report(f"width/D{D}_B{b}_ERROR", repr(e)[:300])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/bench_width.json")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    args = ap.parse_args()
    if args.tiny:
        SHAPES.update(bench=(4, 6, 8), iters=2)
        jax.config.update("jax_platforms", "cpu")
        from trajsde_tpu.utils.cache import cpu_cache_dir

        _cc.set_cache_dir(cpu_cache_dir())
    jax.config.update("jax_default_prng_impl", "rbg")
    print("device:", jax.devices()[0].device_kind, flush=True)
    t0 = time.perf_counter()
    part_width()
    print(f"[width took {time.perf_counter() - t0:.0f}s]", flush=True)
    with open(args.out, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print("\n" + json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
