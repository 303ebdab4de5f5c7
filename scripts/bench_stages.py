"""TPU stage breakdown: fwd and fwd+bwd per model stage at bench shapes.

Isolates where the 80 ms train step goes: AA block alone, full encoder,
aggregator, decoder rollout, and the composed model — each timed with the
honest on-device-chained protocol.  Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stages.py
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental.compilation_cache import compilation_cache as _cc

    _cc.set_cache_dir("/tmp/jax_cache_trajsde")
except Exception:
    pass


def timed(tag, loss_fn, params, iters, grad: bool):
    if grad:
        def fn(p, k):
            v, g = jax.value_and_grad(loss_fn)(p, k)
            return v + jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), g, 0.0)
    else:
        fn = loss_fn

    @jax.jit
    def loop(p):
        def body(i, acc):
            return acc + fn(p, jax.random.fold_in(jax.random.key(3), i))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    v = float(loop(params))
    t0 = time.perf_counter()
    v = float(loop(params))
    dt = time.perf_counter() - t0
    assert np.isfinite(v)
    print(f"{tag:34s}: {dt / iters * 1000:7.2f} ms", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    from __graft_entry__ import _scene
    from trajsde_tpu.models.aggregator import GlobalInteractor
    from trajsde_tpu.models.decoders import SDEDecoder
    from trajsde_tpu.models.local_encoder import AAEncoder
    from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep
    from trajsde_tpu.models import graph

    D, TH, TF, H, F = 64, 21, 60, 8, 10
    dt = jnp.bfloat16
    scene = jax.device_put(_scene(batch_size=args.batch, num_actors=32, num_lanes=64))
    B, A = scene.x.shape[0], scene.x.shape[1]

    # ---- AA block alone -------------------------------------------------
    aa = AAEncoder(historical_steps=TH, embed_dim=D, num_heads=H, dtype=dt)
    mask = graph.aa_masks(scene, 50.0)
    edge_vec = graph.aa_edge_vectors(scene)
    x_t = jnp.transpose(scene.x, (0, 2, 1, 3))
    rot = scene.rotate_mat()
    aa_in = (x_t, x_t, rot, scene.bos_mask, mask, edge_vec)
    pa = aa.init(jax.random.key(0), *aa_in)["params"]

    def aa_loss(p, k):
        return jnp.sum(aa.apply({"params": p}, *aa_in, False,
                                rngs={"dropout": k}).astype(jnp.float32))

    timed("AA block fwd", aa_loss, pa, args.iters, False)
    timed("AA block fwd+bwd", aa_loss, pa, args.iters, True)

    # ---- encoder --------------------------------------------------------
    enc = LocalEncoderSDESep(historical_steps=TH, embed_dim=D, num_heads=H, dtype=dt)
    pe = enc.init({"params": jax.random.key(0), "sde": jax.random.key(1)}, scene)["params"]

    def enc_loss(p, k):
        out = enc.apply({"params": p}, scene, False,
                        rngs={"sde": k, "dropout": jax.random.fold_in(k, 9)})
        return jnp.sum(out[0]) + jnp.sum(out[1]) + jnp.sum(out[2])

    timed("encoder fwd", enc_loss, pe, args.iters, False)
    timed("encoder fwd+bwd", enc_loss, pe, args.iters, True)

    # ---- aggregator -----------------------------------------------------
    agg = GlobalInteractor(historical_steps=TH, embed_dim=D, num_modes=F,
                           num_heads=H, dtype=dt)
    local = jax.random.normal(jax.random.key(4), (B, A, D))
    pg = agg.init(jax.random.key(0), scene, local)["params"]

    def agg_loss(p, k):
        return jnp.sum(agg.apply({"params": p}, scene, local, False,
                                 rngs={"dropout": k}).astype(jnp.float32))

    timed("aggregator fwd", agg_loss, pg, args.iters, False)
    timed("aggregator fwd+bwd", agg_loss, pg, args.iters, True)

    # ---- decoder --------------------------------------------------------
    dec = SDEDecoder(local_channels=D, global_channels=D, future_steps=TF,
                     num_modes=F, dtype=dt)
    glob = jax.random.normal(jax.random.key(5), (B, F, A, D))
    pd = dec.init({"params": jax.random.key(0), "sde": jax.random.key(1)},
                  scene, local, glob)["params"]

    def dec_loss(p, k):
        out = dec.apply({"params": p}, scene, local, glob, rngs={"sde": k})
        return (jnp.sum(out["loc"].astype(jnp.float32))
                + jnp.sum(out["pi"].astype(jnp.float32)))

    timed("decoder fwd", dec_loss, pd, args.iters, False)
    timed("decoder fwd+bwd", dec_loss, pd, args.iters, True)


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    print("devices:", jax.devices(), flush=True)
    main()
