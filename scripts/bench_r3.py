"""Round-3 TPU measurement batch (VERDICT r2 items #3, #4, #6, #7, #8).

Parts (comma-separated via --parts, default all):
  deg      — in-radius degree statistics of the AA masks at bench and
             production shapes (context for the neighbor cap)
  cap      — neighbor-capped AA train step vs dense at bench shape
  prod     — production-shape (B=64/A=48/L=192) train step: dense,
             neighbor-capped, fused AA, fused decoder (the memory-bound
             regime the fused paths were retained for)
  ood      — forward_ood memory envelope at production shape (E=10
             folded vs ood_chunk), via compiled memory_analysis + run
  adaptive — compile + runtime price of ``adaptive: true``
  serving  — ADE/FDE/MR deltas: gaussian XLA-scan forward vs the
             Rademacher Pallas serving engine, same short-trained params

Timing protocol: on-device chained fori_loop + value fetch (CLAUDE.md
"TPU microbenchmarks lie").  Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_r3.py
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
# shape table: overridden by --tiny for CPU smoke runs
SHAPES = {"bench": (128, 32, 64), "prod": (64, 48, 192), "iters": 20}


def report(key, value):
    RESULTS[key] = value
    print(f"{key}: {value}", flush=True)


def train_ms_per_step(model, scene, iters=20, tag=""):
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    state = create_train_state(model, optax.adamw(1e-3, weight_decay=7e-4), scene)
    step = make_train_step(
        model, optax.adamw(1e-3, weight_decay=7e-4),
        [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)], donate=False,
    )

    @jax.jit
    def run(state, scene):
        def body(i, st):
            st, _ = step(st, scene)
            return st
        st = jax.lax.fori_loop(0, iters, body, state)
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b), st.params, 0.0
        )

    t0 = time.perf_counter()
    v = float(run(state, scene))  # compile + warmup
    compile_s = time.perf_counter() - t0
    assert np.isfinite(v), f"{tag}: non-finite checksum"
    t0 = time.perf_counter()
    v = float(run(state, scene))
    dt = time.perf_counter() - t0
    return dt / iters * 1000, compile_s


def part_deg():
    from __graft_entry__ import _scene
    from trajsde_tpu.models import graph

    for tag, (b, a, l) in {"bench_B128_A32": SHAPES["bench"],
                           "prod_B64_A48": SHAPES["prod"]}.items():
        scene = _scene(b, a, l)
        mask = np.asarray(graph.aa_masks(scene, 50.0))  # [B, Th, A, A]
        deg = mask.sum(-1)
        total = max(int(deg.sum()), 1)
        report(f"deg/{tag}", {
            "max": int(deg.max()),
            "p99": float(np.quantile(deg, 0.99)),
            "mean": round(float(deg.mean()), 2),
            "A": a,
            # fraction of real edges a cap K would DROP (overflow)
            "dropped_frac": {
                K: round(float(np.maximum(deg - K, 0).sum()) / total, 4)
                for K in (8, 16, 24, 32)
            },
        })


def part_cap():
    from __graft_entry__ import _build_flagship, _scene

    scene = jax.device_put(_scene(*SHAPES["bench"]))
    for cap in (0, 8, 16):
        model = _build_flagship(dtype=jnp.bfloat16, neighbor_cap=cap)
        ms, cs = train_ms_per_step(model, scene, iters=SHAPES["iters"], tag=f"cap{cap}")
        report(f"cap/bench_B128_A32_cap{cap}_ms", round(ms, 2))


def part_prod():
    from __graft_entry__ import _build_flagship, _scene

    scene = jax.device_put(_scene(*SHAPES["prod"]))
    variants = {
        "dense": {},
        "cap24": {"neighbor_cap": 24},
        "cap32": {"neighbor_cap": 32},
        "fused_aa": {"fused": True},
        "fused_dec": {"fused_decoder": True},
    }
    for name, kw in variants.items():
        try:
            model = _build_flagship(dtype=jnp.bfloat16, **kw)
            ms, cs = train_ms_per_step(model, scene, iters=SHAPES["iters"], tag=name)
            report(f"prod/B64_A48_L192_{name}_ms", round(ms, 2))
            report(f"prod/B64_A48_L192_{name}_scenes_per_s", round(64000.0 / ms, 1))
        except Exception as e:  # OOM etc. — record honestly
            report(f"prod/B64_A48_L192_{name}_ERROR", repr(e)[:300])


def part_prod128():
    """Direct B=128 at production shape: the fused AA path eliminates the
    pair residuals that spilled the dense step (PERF.md B=256 root cause)."""
    from __graft_entry__ import _build_flagship, _scene

    b, a, l = SHAPES["prod"]
    scene = jax.device_put(_scene(2 * b, a, l))
    for name, kw in {
        "dense": {},
        "fused_aa": {"fused": True},
        "cap24": {"neighbor_cap": 24},
        "cap32": {"neighbor_cap": 32},
    }.items():
        try:
            model = _build_flagship(dtype=jnp.bfloat16, **kw)
            ms, cs = train_ms_per_step(model, scene, iters=SHAPES["iters"], tag=name)
            report(f"prod128/B{2*b}_A{a}_L{l}_{name}_ms", round(ms, 2))
            report(
                f"prod128/B{2*b}_A{a}_L{l}_{name}_scenes_per_s",
                round(2 * b * 1000.0 / ms, 1),
            )
        except Exception as e:
            report(f"prod128/B{2*b}_A{a}_L{l}_{name}_ERROR", repr(e)[:300])


def part_ood():
    from __graft_entry__ import _build_flagship, _scene

    scene = jax.device_put(_scene(*SHAPES["prod"]))
    for chunk in (0, 2):
        model = _build_flagship(dtype=jnp.bfloat16, ood_chunk=chunk)
        params = jax.jit(model.init)(
            {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene
        )

        def fwd(p, s, k):
            out = model.apply(p, s, ood=True, rngs={"sde": k})
            return out["loc"].sum() + out["stds"].sum()

        try:
            lowered = jax.jit(fwd).lower(params, scene, jax.random.key(2))
            compiled = lowered.compile()
            mem = compiled.memory_analysis()
            report(f"ood/chunk{chunk}_temp_MiB",
                   round(getattr(mem, "temp_size_in_bytes", 0) / 2**20, 1))
            t0 = time.perf_counter()
            v = float(compiled(params, scene, jax.random.key(2)))
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            v = float(compiled(params, scene, jax.random.key(3)))
            dt = time.perf_counter() - t0
            assert np.isfinite(v)
            report(f"ood/chunk{chunk}_ms", round(dt * 1000, 1))
        except Exception as e:
            report(f"ood/chunk{chunk}_ERROR", repr(e)[:300])


def part_adaptive(budget_s: float = 1200.0):
    from __graft_entry__ import _build_flagship, _scene

    scene = jax.device_put(_scene(*SHAPES["bench"]))
    model = _build_flagship(dtype=jnp.bfloat16, adaptive=True)
    try:
        t0 = time.perf_counter()
        ms, compile_s = train_ms_per_step(model, scene, iters=5, tag="adaptive")
        report("adaptive/B128_A32_compile_s", round(compile_s, 1))
        report("adaptive/B128_A32_ms", round(ms, 2))
    except Exception as e:
        report("adaptive/B128_A32_ERROR", repr(e)[:300])


def part_capacc():
    """Accuracy impact of the lossy cap: train dense vs neighbor_cap=8
    (35% of edges dropped at this shape) on the same synthetic stream,
    compare final eval metrics."""
    from __graft_entry__ import _build_flagship
    from trajsde_tpu.data.synthetic import make_scene_batch
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_eval_step, make_train_step
    from trajsde_tpu.train.metrics import make_metrics

    b, a, l = SHAPES["bench"]
    rng = np.random.default_rng(0)
    train_scenes = [
        jax.device_put(make_scene_batch(rng, b, a, l, sources=[0, 1]))
        for _ in range(4)
    ]
    val_scene = jax.device_put(
        make_scene_batch(np.random.default_rng(99), b, a, l, sources=[0, 1])
    )
    for name, cap in (("dense", 0), ("cap8", 8)):
        model = _build_flagship(dtype=jnp.bfloat16, neighbor_cap=cap)
        opt = optax.adamw(optax.cosine_decay_schedule(1e-3, 400), weight_decay=7e-4)
        state = create_train_state(model, opt, train_scenes[0])
        step = make_train_step(
            model, opt, [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)],
            donate=False,
        )
        for it in range(400):
            state, _ = step(state, train_scenes[it % 4])
        metrics = make_metrics(
            ["ADE_T", "FDE_T", "MR_T"],
            [{"dataset": "nuScenes", "end_idcs": [59, 29]}] * 3,
        )
        eval_step = make_eval_step(model, metrics)
        for m in metrics:
            m.reset()
        c = eval_step(state.params, val_scene, jax.random.key(5), np.int32(0))
        for m in metrics:
            m.accumulate(jax.tree.map(float, c[m.name]))
        report(f"capacc/{name}", {m.name: round(float(m.compute()), 4) for m in metrics})


def part_serving():
    from __graft_entry__ import _build_flagship, _scene
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.serving import make_serving_fn
    from trajsde_tpu.train.loop import (
        agent_slices, create_train_state, make_train_step,
    )
    from trajsde_tpu.train.metrics import make_metrics

    model = _build_flagship(dtype=jnp.bfloat16)
    scene = jax.device_put(_scene(*SHAPES["bench"]))
    opt = optax.adamw(1e-3, weight_decay=7e-4)
    state = create_train_state(model, opt, scene)
    step = make_train_step(
        model, opt, [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)],
        donate=False,
    )

    @jax.jit
    def train_n(state, scene):
        def body(i, st):
            st, _ = step(st, scene)
            return st
        return jax.lax.fori_loop(0, 60, body, state)

    state = train_n(state, scene)
    jax.block_until_ready(state.params)
    params = {"params": state.params}

    metrics = make_metrics(
        ["ADE_T", "FDE_T", "MR_T"],
        [{"dataset": "nuScenes", "end_idcs": [59, 29]}] * 3,
    )

    from trajsde_tpu.data.synthetic import make_scene_batch

    def _val_scene(i):
        b, a, l = SHAPES["bench"]
        return make_scene_batch(
            np.random.default_rng(100 + i), batch_size=b, num_actors=a,
            num_lanes=l, sources=[0, 1],
        )

    def metric_pass(outputs_fn, n_batches=8):
        for m in metrics:
            m.reset()
        for i in range(n_batches):
            val_scene = jax.device_put(_val_scene(i))
            out = outputs_fn(val_scene, i)
            pred, target, reg_mask, source = agent_slices(val_scene, out)
            for m in metrics:
                m.accumulate(m.update_fn(pred, target, reg_mask, source))
        return {m.name: float(m.compute()) for m in metrics}

    # engine 1: standard forward (gaussian XLA scan)
    @jax.jit
    def gauss_fwd(p, s, k):
        return model.apply({"params": p}, s, rngs={"sde": k})

    g = metric_pass(lambda s, i: gauss_fwd(state.params, s, jax.random.key(i)))
    report("serving/gaussian_scan", {k: round(v, 4) for k, v in g.items()})

    # engine 2: Rademacher Pallas serving kernel (TPU only: the CPU
    # interpreter lacks the on-core PRNG primitives — CLAUDE.md)
    if jax.default_backend() != "tpu":
        report("serving/rademacher_kernel", "SKIPPED (needs TPU on-core PRNG)")
        return
    serve = make_serving_fn(model, params, increments="rademacher")
    def rad_out(s, i):
        return serve(s, jax.random.key(i), jnp.int32(1234 + i))
    r = metric_pass(rad_out)
    report("serving/rademacher_kernel", {k: round(v, 4) for k, v in r.items()})
    report("serving/rel_delta", {
        k: round(abs(r[k] - g[k]) / max(abs(g[k]), 1e-9), 4) for k in g
    })


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", default="deg,cap,prod,ood,serving,adaptive")
    ap.add_argument("--out", default="/tmp/bench_r3.json")
    ap.add_argument("--tiny", action="store_true", help="CPU smoke shapes")
    args = ap.parse_args()
    if args.tiny:
        SHAPES.update(bench=(4, 6, 8), prod=(4, 8, 12), iters=2)
        jax.config.update("jax_platforms", "cpu")
        from trajsde_tpu.utils.cache import cpu_cache_dir

        _cc.set_cache_dir(cpu_cache_dir())
    # match bench.py's headline methodology (rbg PRNG, ~1.24x on mask gen)
    jax.config.update("jax_default_prng_impl", "rbg")
    print("device:", jax.devices()[0].device_kind, flush=True)
    for part in args.parts.split(","):
        print(f"\n=== {part} ===", flush=True)
        t0 = time.perf_counter()
        try:
            globals()[f"part_{part}"]()
        except Exception as e:
            report(f"{part}/FATAL", repr(e)[:500])
        print(f"[{part} took {time.perf_counter() - t0:.0f}s]", flush=True)
        with open(args.out, "w") as f:
            json.dump(RESULTS, f, indent=2)
    print("\n" + json.dumps(RESULTS, indent=2))


if __name__ == "__main__":
    main()
