"""Serving-engine END-TO-END throughput on the real chip (round 5).

The recorded serving numbers (bench.py ``serving_*``,
``scripts/bench_serving.py``) are device-only: the jitted forward timed
inside one fori_loop with no host pack and no result fetch.  This script
measures what a deployed engine actually sustains through
``ServingEngine.predict`` — align → pack (C++ packer) → ONE device
dispatch → ``device_get`` of the results → per-scene assembly — and A/Bs
the ``slim`` knob (focal-agent-only results, ~1 MiB fetched per batch)
against the full-grid default (~9 MiB at the bench shape, ~35 MiB at
production capacity) IN ONE PROCESS, interleaved, because the relay
drifts ~30% between runs (CLAUDE.md).

Optionally (``--http``) it also drives the HTTP front-end with concurrent
npz-posting client threads — on this single-core host the clients contend
with the server for the same CPU, so that number is a lower bound, noted
as such.

Usage: python scripts/bench_serving_e2e.py [--rounds 8] [--http]
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--actors", type=int, default=32)
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--http", action="store_true",
                    help="also drive the HTTP front-end (slim engine)")
    ap.add_argument("--http-seconds", type=float, default=20.0)
    ap.add_argument("--http-clients", type=int, default=16)
    args = ap.parse_args()

    import jax

    try:
        from jax.experimental.compilation_cache import compilation_cache as cc

        cc.set_cache_dir("/tmp/jax_cache_trajsde")
    except Exception:
        pass
    jax.config.update("jax_default_prng_impl", "rbg")

    import jax.numpy as jnp

    from __graft_entry__ import _build_flagship
    from trajsde_tpu.data.synthetic import make_raw_scene
    from trajsde_tpu.data.pack import pack_scenes
    from trajsde_tpu.server import ServingEngine, align_scene

    B, A, L = args.batch, args.actors, args.lanes
    rng = np.random.default_rng(0)
    model = _build_flagship(dtype=jnp.bfloat16)
    from trajsde_tpu.data.synthetic import make_scene_batch

    template_scene = make_scene_batch(rng, batch_size=1, num_actors=A, num_lanes=L)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, template_scene
    )["params"]

    scenes = [
        make_raw_scene(rng, s % 2, num_actors=max(2, A - 8),
                       num_lanes=max(2, L - 16))
        for s in range(B)
    ]

    def mk(slim: bool) -> ServingEngine:
        return ServingEngine(
            model, params, num_actors=A, num_lanes=L, engine="auto",
            batch_buckets=(B,), max_batch=B, seed=3, slim=slim,
        )

    engines = {"full": mk(False), "slim": mk(True)}
    print(json.dumps({"engine_kind": engines["full"].engine,
                      "backend": jax.default_backend()}))

    # host-stage microcosts at this shape, for the stage split.  Warm
    # each stage once first: the first pack on the TPU backend includes
    # the relay handshake / transfer setup (measured 1010 ms cold vs
    # ~60 ms warm at this shape) and would poison the stage split
    aligned = [align_scene(s)[0] for s in scenes]
    t0 = time.perf_counter()
    for s in scenes:
        align_scene(s)
    align_ms = (time.perf_counter() - t0) * 1e3
    pack_scenes(aligned, A, L, use_native=True)  # warm
    reps = 3
    # NOTE: as_jax=True issues ASYNC device transfers — this times pack +
    # transfer DISPATCH only; transfer completion lands inside the e2e
    # numbers below (the relay's ready-flags can't be trusted to close a
    # per-stage timing, CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(reps):
        pack_scenes(aligned, A, L, use_native=True)
    pack_ms = (time.perf_counter() - t0) / reps * 1e3
    t0 = time.perf_counter()
    for _ in range(reps):
        pack_scenes(aligned, A, L, use_native=True, as_jax=False)
    pack_host_ms = (time.perf_counter() - t0) / reps * 1e3
    print(json.dumps({"align_ms_per_batch": round(align_ms, 1),
                      "pack_dispatch_ms_per_batch": round(pack_ms, 1),
                      "pack_hostonly_ms_per_batch": round(pack_host_ms, 1)}))

    for eng in engines.values():
        eng.predict(scenes)  # compile + warm

    times: dict = {"full": [], "slim": []}
    for r in range(args.rounds):
        for name, eng in engines.items():  # interleaved A/B
            t0 = time.perf_counter()
            out = eng.predict(scenes)
            dt = time.perf_counter() - t0
            assert len(out) == B and np.isfinite(out[0]["agent_world"]).all()
            times[name].append(dt)
    for name, ts in times.items():
        med = float(np.median(ts)) * 1e3
        print(json.dumps({
            "mode": name,
            "e2e_ms_per_batch": round(med, 2),
            "e2e_scenes_per_sec": round(B / (med / 1e3), 1),
            "rounds_ms": [round(t * 1e3, 1) for t in ts],
        }))

    # pipeline A/B: bulk predict over 4 chunks of B — serial vs one batch
    # in flight (slim engine, interleaved in this same process)
    bulk = scenes * 4
    eng = engines["slim"]
    ptimes: dict = {"serial": [], "pipelined": []}
    for r in range(max(3, args.rounds // 2)):
        for name, flag in (("serial", False), ("pipelined", True)):
            t0 = time.perf_counter()
            out = eng.predict(bulk, pipeline=flag)
            dt = time.perf_counter() - t0
            assert len(out) == len(bulk)
            ptimes[name].append(dt)
    for name, ts in ptimes.items():
        med = float(np.median(ts)) * 1e3
        print(json.dumps({
            "mode": f"bulk_{name}",
            "chunks": 4,
            "e2e_ms_per_chunk": round(med / 4, 2),
            "e2e_scenes_per_sec": round(len(bulk) / (med / 1e3), 1),
            "rounds_ms": [round(t * 1e3, 1) for t in ts],
        }))

    if args.http:
        import io
        import urllib.request
        from concurrent.futures import ThreadPoolExecutor

        from trajsde_tpu.httpd import run_http_server

        bodies = []
        for s in scenes[:32]:
            buf = io.BytesIO()
            np.savez(buf, **s)
            bodies.append(buf.getvalue())
        # fresh counters: the A/B phases above already recorded ~40
        # batches of 128 — without the reset, mean_batch would report
        # their sizes, not the micro-batcher occupancy under HTTP load
        engines["slim"].reset_stats()
        server, port = run_http_server(engines["slim"], "127.0.0.1", 0)
        base = f"http://127.0.0.1:{port}/predict"
        stop = time.perf_counter() + args.http_seconds
        counts = [0] * args.http_clients

        def client(i: int) -> None:
            k = 0
            while time.perf_counter() < stop:
                req = urllib.request.Request(
                    base, data=bodies[k % len(bodies)],
                    headers={"Content-Type": "application/octet-stream",
                             "Accept": "application/x-npz"},
                )
                with urllib.request.urlopen(req, timeout=300) as r:
                    np.load(io.BytesIO(r.read()))["agent_world"]
                counts[i] += 1
                k += 1

        t0 = time.perf_counter()
        with ThreadPoolExecutor(args.http_clients) as ex:
            list(ex.map(client, range(args.http_clients)))
        span = time.perf_counter() - t0
        served = sum(counts)
        st = engines["slim"].stats()
        print(json.dumps({
            "mode": "http_slim_npz",
            "clients": args.http_clients,
            "scenes_per_sec": round(served / span, 1),
            "served": served,
            "mean_batch": st["mean_batch"],
            "p50_ms": round(st["p50_ms"], 1) if st["p50_ms"] else None,
            "note": "single-core host: clients contend with the server; lower bound",
        }))
        server.shutdown()

    for eng in engines.values():
        eng.close()


if __name__ == "__main__":
    main()
