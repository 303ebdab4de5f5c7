"""TPU serving benchmark: per-bucket device-side serve time + engine wall.

Two numbers per batch bucket, honestly separated:

- ``device_ms``: the jitted serving fn chained ITERS× on-device inside
  one fori_loop, closed by a value fetch (the per-batch device cost a
  real TPU-VM host would see);
- ``wall_ms``: one engine ``predict`` call end to end on THIS host —
  includes the relay's ~30-40 ms dispatch round trip plus host packing,
  so it upper-bounds single-request latency in this tunneled setup.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_serving.py
"""
from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.set_cache_dir("/tmp/jax_cache_trajsde")
except Exception:
    pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, nargs="+", default=[1, 32, 128])
    ap.add_argument("--actors", type=int, default=32)
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--ood", action="store_true",
                    help="serve with OOD scoring (encoder ensemble stds "
                         "attached; costs ~eval_iter x the encoder)")
    args = ap.parse_args()

    from __graft_entry__ import _build_flagship, _scene
    from trajsde_tpu.data.synthetic import make_raw_scene
    from trajsde_tpu.serving import make_serving_fn
    from trajsde_tpu.server import ServingEngine

    model = _build_flagship(dtype=jnp.bfloat16)
    init_scene = _scene(batch_size=1, num_actors=args.actors, num_lanes=args.lanes)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "sde": jax.random.key(1)}, init_scene
    )
    serve = make_serving_fn(model, params, ood=args.ood)

    rng = np.random.default_rng(0)
    raw = make_raw_scene(rng, 0, num_actors=args.actors, num_lanes=args.lanes)

    eng = ServingEngine(
        model, params["params"],
        num_actors=args.actors, num_lanes=args.lanes,
        engine="kernel", batch_buckets=tuple(args.buckets), ood=args.ood,
    )

    for b in args.buckets:
        scene = jax.device_put(
            _scene(batch_size=b, num_actors=args.actors, num_lanes=args.lanes)
        )

        @jax.jit
        def chain(scene, key):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                seed = jax.random.randint(k, (), 0, jnp.iinfo(jnp.int32).max)
                out = serve(scene, k, seed)
                return acc + jnp.sum(out["loc"].astype(jnp.float32))

            return jax.lax.fori_loop(0, args.iters, body, 0.0)

        v = float(chain(scene, jax.random.key(1)))  # compile + warm
        t0 = time.perf_counter()
        v = float(chain(scene, jax.random.key(2)))
        device_ms = (time.perf_counter() - t0) / args.iters * 1e3
        assert np.isfinite(v)

        reqs = [dict(raw) for _ in range(b)]
        eng.predict(reqs)  # warm the engine executable for this bucket
        t0 = time.perf_counter()
        eng.predict(reqs)
        wall_ms = (time.perf_counter() - t0) * 1e3

        print(json.dumps({
            "bucket": b,
            "device_ms": round(device_ms, 2),
            "device_scenes_per_s": round(b / device_ms * 1e3, 1),
            "wall_ms": round(wall_ms, 2),
        }), flush=True)
    eng.close()


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    print("devices:", jax.devices(), flush=True)
    main()
