"""Headline benchmark: SDE-model training throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The measured quantity is full training-step throughput (fwd + bwd + AdamW
update) of the flagship neural-SDE model — encoder 21-segment
Euler–Maruyama ODE-RNN + 60-step SDE decoder rollout — on synthetic
scenes at reference scale.  ``vs_baseline`` is measured against the first
recorded value in BENCH_BASELINE.json (the reference publishes no
throughput numbers — BASELINE.md), so cross-round improvements are
tracked self-relative.

The record also carries ``production_*`` keys: the same step at
PRODUCTION scene capacity (B=128 / A=48 / L=192 — nuScenes 80 m-radius
scale, bf16), so the real regime is driver-tracked alongside the bench
shape (VERDICT r2 item #4).
"""
from __future__ import annotations

import json
import os
import time

import jax
import numpy as np
import optax

BATCH, ACTORS, LANES = 128, 32, 64
PROD_BATCH, PROD_ACTORS, PROD_LANES = 128, 48, 192
ITERS = 20
PROD_ITERS = 10
if os.environ.get("TRAJSDE_BENCH_TINY"):  # CPU smoke of the full script
    BATCH, ACTORS, LANES = 4, 6, 8
    PROD_BATCH, PROD_ACTORS, PROD_LANES = 4, 6, 8
    ITERS = PROD_ITERS = 2
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE.json")


def _enable_compile_cache() -> None:
    try:
        from jax.experimental.compilation_cache import compilation_cache as cc

        cc.set_cache_dir(os.environ.get("TRAJSDE_CACHE", "/tmp/jax_cache_trajsde"))
    except Exception:
        pass


def _backend_watchdog(timeout_s: float = 600.0) -> None:
    """Fail fast (one honest JSON error line) if backend init hangs.

    The tunneled TPU backend blocks INSIDE ``jax.devices()`` with no
    timeout when the relay is down; without this guard a bench invocation
    hangs instead of reporting.  Probes device init in a daemon thread and
    exits with an error record if it never returns.
    """
    import threading

    done = threading.Event()
    holder = {}

    def probe():
        try:
            holder["devices"] = jax.devices()
        except Exception as e:  # init errored — report rather than raise
            holder["error"] = repr(e)
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s) or "error" in holder:
        print(json.dumps({
            "metric": "sde_train_scenes_per_sec",
            "value": None,
            "unit": "scenes/sec/chip",
            "vs_baseline": None,
            "error": holder.get(
                "error", f"backend init did not return in {timeout_s:.0f}s "
                "(TPU tunnel down?)"
            ),
        }))
        raise SystemExit(1)


def main() -> None:
    _enable_compile_cache()
    _backend_watchdog()
    # hardware-friendly counter-based PRNG: dropout/Brownian mask generation
    # over the big pair tensors is ~1.24x faster than threefry on v5e
    jax.config.update("jax_default_prng_impl", "rbg")
    from __graft_entry__ import _build_flagship, _scene
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    import jax.numpy as _jnp

    model = _build_flagship(dtype=_jnp.bfloat16)  # mixed precision train step
    scene = _scene(batch_size=BATCH, num_actors=ACTORS, num_lanes=LANES)
    scene = jax.device_put(scene)

    optimizer = optax.adamw(1e-3, weight_decay=7e-4)
    state = create_train_state(model, optimizer, scene)
    step = make_train_step(
        model,
        optimizer,
        [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)],
        donate=False,
    )

    # Methodology note: this host reaches the chip through an async relay
    # whose block_until_ready can return before execution completes, so the
    # ITERS steps run inside ONE jitted fori_loop and the timing is closed
    # by an actual value fetch (see CLAUDE.md "TPU microbenchmarks lie").
    import jax.numpy as jnp

    def make_runner(n_iters):
        @jax.jit
        def run(state, scene):
            def body(i, st):
                st, _ = step(st, scene)
                return st
            st = jax.lax.fori_loop(0, n_iters, body, state)
            return st, jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), st.params, 0.0
            )
        return run

    run_steps = make_runner(ITERS)

    # analytic FLOP count of ONE train step from its compiled executable
    # (XLA cost analysis does not multiply loop trip counts, so the
    # fori_loop wrapper must not be the lowering target) → MFU against the
    # chip's peak (VERDICT r1 item 3)
    cost = step.lower(state, scene).compile().cost_analysis() or {}
    total_flops = float(cost.get("flops", float("nan"))) * ITERS
    kind = jax.devices()[0].device_kind
    peaks = {
        "TPU v5 lite": 394e12,   # v5e bf16 peak
        "TPU v5": 459e12,        # v5p
        "TPU v4": 275e12,
        "TPU v6 lite": 918e12,   # v6e (Trillium)
    }
    # exact kind first, then longest key prefix ("TPU v5 lite" must not
    # fall through to "TPU v5"); rstrip-of-digits would mangle "TPU v4"
    peak = peaks.get(kind) or next(
        (v for k, v in sorted(peaks.items(), key=lambda kv: -len(kv[0]))
         if kind.startswith(k)),
        None,
    )

    state, checksum = run_steps(state, scene)  # warmup (executable cached)
    checksum = float(checksum)  # fetch OUTSIDE assert: -O must not skip it
    assert np.isfinite(checksum)
    t0 = time.perf_counter()
    state, checksum = run_steps(state, scene)
    checksum = float(checksum)  # value fetch closes the timing
    dt = time.perf_counter() - t0

    scenes_per_sec = BATCH * ITERS / dt
    mfu = (total_flops / dt / peak) if (peak and np.isfinite(total_flops)) else None
    assert np.isfinite(checksum)

    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = scenes_per_sec
        with open(BASELINE_PATH, "w") as f:
            json.dump(
                {
                    "value": scenes_per_sec,
                    "unit": "scenes/sec",
                    "config": {"batch": BATCH, "actors": ACTORS, "lanes": LANES},
                    "note": "first recorded run (round 1); reference publishes no numbers",
                },
                f,
                indent=2,
            )

    record = {
        "metric": "sde_train_scenes_per_sec",
        "value": round(scenes_per_sec, 2),
        "unit": "scenes/sec/chip",
        "vs_baseline": round(scenes_per_sec / baseline, 3),
        "ms_per_step": round(dt / ITERS * 1000, 2),
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
        record["device"] = kind

    # production-shape record (same protocol, fewer iters): direct B=128
    # bf16 — the bf16 activations fit where f32 spilled (PERF.md Round 3)
    try:
        prod_scene = jax.device_put(
            _scene(batch_size=PROD_BATCH, num_actors=PROD_ACTORS, num_lanes=PROD_LANES)
        )
        # params/opt state are shape-independent: reuse the bench state
        # instead of re-jitting model.init at the production shape (each
        # new executable costs 40-260 s through the remote compile helper)
        prod_state = state
        run_prod = make_runner(PROD_ITERS)

        prod_state, c = run_prod(prod_state, prod_scene)
        c = float(c)
        assert np.isfinite(c)
        t0 = time.perf_counter()
        _, c = run_prod(prod_state, prod_scene)
        c = float(c)
        pdt = time.perf_counter() - t0
        assert np.isfinite(c)
        record["production_ms_per_step"] = round(pdt / PROD_ITERS * 1000, 2)
        record["production_scenes_per_sec"] = round(PROD_BATCH * PROD_ITERS / pdt, 1)
        record["production_config"] = f"B{PROD_BATCH}/A{PROD_ACTORS}/L{PROD_LANES} bf16"
    except Exception as e:  # record the failure rather than losing the headline
        record["production_error"] = repr(e)[:200]

    # serving throughput (kernel engine, Rademacher increments — the
    # shipped serving default; PERF.md "Serving engine benched")
    try:
        from trajsde_tpu.serving import make_serving_fn

        serve = make_serving_fn(model, {"params": state.params})

        @jax.jit
        def run_serve(scene, key):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                seed = jax.random.randint(k, (), 0, jnp.iinfo(jnp.int32).max)
                out = serve(scene, k, seed)
                return acc + jnp.sum(out["loc"].astype(jnp.float32))

            return jax.lax.fori_loop(0, ITERS, body, 0.0)

        v = float(run_serve(scene, jax.random.key(7)))  # warmup
        assert np.isfinite(v)  # v already fetched above — safe under -O
        t0 = time.perf_counter()
        v = float(run_serve(scene, jax.random.key(8)))
        sdt = time.perf_counter() - t0
        assert np.isfinite(v)
        record["serving_ms_per_batch"] = round(sdt / ITERS * 1000, 2)
        record["serving_scenes_per_sec"] = round(BATCH * ITERS / sdt, 1)
    except Exception as e:
        record["serving_error"] = repr(e)[:200]

    # end-to-end training throughput: packed-shard loader → threaded
    # device_prefetch → per-batch train step at production capacity (the
    # real pipeline a user runs, VERDICT r3 item #3).  Steps dispatch
    # individually (no fori_loop chaining): the measured quantity IS the
    # host/loader/transfer overlap, closed per step by the loss fetch.
    try:
        import shutil
        import tempfile

        from trajsde_tpu.data.loader import BatchLoader, NuArgoDataset
        from trajsde_tpu.data.shards import convert_npz_dir
        from trajsde_tpu.data.synthetic import make_raw_scene
        from trajsde_tpu.train.loop import device_prefetch

        E2E_STEPS = 4 if os.environ.get("TRAJSDE_BENCH_TINY") else 16
        rng = np.random.default_rng(0)
        with tempfile.TemporaryDirectory() as tmp:
            raw_dir = os.path.join(tmp, "raw", "Argoverse", "train")
            os.makedirs(raw_dir)
            for i in range(PROD_BATCH * (E2E_STEPS + 4)):
                # one domain per directory tree (its shard files pack
                # homogeneous per-domain step counts, data/shards.py)
                raw = make_raw_scene(rng, 1, num_actors=40, num_lanes=160)
                np.savez(os.path.join(raw_dir, f"s{i:05d}.npz"), **raw)
            shard_dir = os.path.join(tmp, "shards", "Argoverse", "train")
            convert_npz_dir(raw_dir, shard_dir)
            shutil.rmtree(raw_dir)
            ds = NuArgoDataset(
                "train", argo_dir=os.path.dirname(shard_dir), nus=False,
                random_flip=True,
            )
            loader = BatchLoader(
                ds, batch_size=PROD_BATCH, num_actors=PROD_ACTORS,
                num_lanes=PROD_LANES, shuffle=True,
            )
            it = device_prefetch(iter(loader))
            # warmup: executable already cached from the production segment
            # (same B/A/L shape); first steps absorb any residual compile
            # (params/opt state are shape-independent, so the bench state
            # works if the production segment errored out early)
            st = locals().get("prod_state", state)
            for _ in range(3):
                st, logs = step(st, next(it))
            assert np.isfinite(float(logs["train/total"]))
            t0 = time.perf_counter()
            n = 0
            for scene_b in it:
                st, logs = step(st, scene_b)
                n += 1
                if n >= E2E_STEPS:
                    break
            assert np.isfinite(float(logs["train/total"]))  # closes timing
            edt = time.perf_counter() - t0
            record["e2e_ms_per_step"] = round(edt / n * 1000, 2)
            record["e2e_scenes_per_sec"] = round(PROD_BATCH * n / edt, 1)
    except Exception as e:
        record["e2e_error"] = repr(e)[:200]

    # serving END-TO-END: ServingEngine.predict — align → C++ pack → one
    # dispatch → slim result fetch → assembly (the deployed hot path;
    # slim is the recommended daemon mode, PERF.md round 5).  Individual
    # wall-clock predict calls: the measured quantity IS the host+transfer
    # path the device-only number above excludes.  Runs LAST: the engine's
    # resident executables/buffers measurably degrade the production-shape
    # train step (e2e 175->330 ms/step when this ran before it — the
    # training segments must see the same device state as a training run).
    try:
        from trajsde_tpu.data.synthetic import make_raw_scene
        from trajsde_tpu.server import ServingEngine

        SE_ROUNDS = 2 if os.environ.get("TRAJSDE_BENCH_TINY") else 5
        rng = np.random.default_rng(3)
        raw = [
            make_raw_scene(rng, s % 2, num_actors=max(2, ACTORS - 8),
                           num_lanes=max(2, LANES - 16))
            for s in range(BATCH)
        ]
        eng = ServingEngine(
            model, state.params, num_actors=ACTORS, num_lanes=LANES,
            engine="auto", batch_buckets=(BATCH,), max_batch=BATCH,
            seed=3, slim=True,
        )
        try:
            eng.predict(raw)  # compile + relay warm
            ts = []
            for _ in range(SE_ROUNDS):
                t0 = time.perf_counter()
                out = eng.predict(raw)
                ts.append(time.perf_counter() - t0)
            assert len(out) == BATCH
            assert np.isfinite(out[0]["agent_world"]).all()
            sed = float(np.median(ts))
            record["serving_e2e_ms_per_batch"] = round(sed * 1000, 2)
            record["serving_e2e_scenes_per_sec"] = round(BATCH / sed, 1)
        finally:
            eng.close()
    except Exception as e:
        record["serving_e2e_error"] = repr(e)[:200]


    print(json.dumps(record))


if __name__ == "__main__":
    main()
