"""Speed-of-light (roofline) analysis of the train step, per stage.

For each stage (AA block, full encoder, aggregator, decoder, full train
step) this compiles the jitted function, pulls XLA's cost analysis
(FLOPs + HBM bytes accessed, post-fusion), computes the v5e roofline
lower bound

    t_sol = max(flops / peak_flops, bytes / hbm_bw)

and compares it against the honestly-measured time (on-device chained
fori_loop + value-fetch close, same protocol as bench.py).  The ratio
``measured / t_sol`` is the headroom multiplier: ~1 means the stage runs
at the speed of light for its math; large means either overhead or an
algorithmic lever.

Peaks (v5e, single chip): 394 TFLOP/s bf16 / 197 TFLOP/s f32 MXU,
819 GB/s HBM.  XLA's "bytes accessed" is post-fusion HLO traffic — an
upper bound on true HBM bytes (reused operands inside one fusion are not
double counted, but buffers that stay resident in VMEM across ops are).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sol_analysis.py
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

PEAK_BF16 = 394e12  # v5e MXU bf16 FLOP/s
PEAK_F32 = 197e12
HBM_BW = 819e9  # bytes/s


def analyze(tag, loss_fn, params, iters, grad: bool, results):
    """Lower one call for cost analysis; time ITERS chained on-device."""
    if grad:
        def fn(p, k):
            v, g = jax.value_and_grad(loss_fn)(p, k)
            return v + jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), g, 0.0)
    else:
        fn = loss_fn

    key = jax.random.key(3)
    compiled = jax.jit(fn).lower(params, key).compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", float("nan")))
    nbytes = float(cost.get("bytes accessed", float("nan")))

    @jax.jit
    def loop(p):
        def body(i, acc):
            return acc + fn(p, jax.random.fold_in(key, i))

        return jax.lax.fori_loop(0, iters, body, 0.0)

    v = float(loop(params))
    t0 = time.perf_counter()
    v = float(loop(params))
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(v)

    t_mxu = flops / PEAK_BF16
    t_hbm = nbytes / HBM_BW
    t_sol = max(t_mxu, t_hbm)
    rec = {
        "stage": tag,
        "measured_ms": round(dt * 1e3, 2),
        "gflops": round(flops / 1e9, 2),
        "hbm_gb": round(nbytes / 1e9, 3),
        "sol_mxu_ms": round(t_mxu * 1e3, 3),
        "sol_hbm_ms": round(t_hbm * 1e3, 3),
        "sol_ms": round(t_sol * 1e3, 3),
        "headroom_x": round(dt / t_sol, 1) if t_sol > 0 else None,
        "bound": "hbm" if t_hbm > t_mxu else "mxu",
        "achieved_gbps": round(nbytes / dt / 1e9, 1),
        "achieved_tflops": round(flops / dt / 1e12, 2),
    }
    results.append(rec)
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--actors", type=int, default=32)
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--stages", action="store_true", help="also per-stage analysis")
    args = ap.parse_args()

    import optax

    from __graft_entry__ import _build_flagship, _scene
    from trajsde_tpu.losses import diff_bce_loss, l2_loss
    from trajsde_tpu.train.loop import create_train_state, make_train_step

    dt16 = jnp.bfloat16
    model = _build_flagship(dtype=dt16)
    scene = jax.device_put(
        _scene(batch_size=args.batch, num_actors=args.actors, num_lanes=args.lanes)
    )
    optimizer = optax.adamw(1e-3, weight_decay=7e-4)
    state = create_train_state(model, optimizer, scene)
    step = make_train_step(
        model,
        optimizer,
        [("L2", 1.0, l2_loss), ("DiffBCE", 1.0, diff_bce_loss)],
        donate=False,
    )

    results = []

    # ---- full train step ------------------------------------------------
    compiled = step.lower(state, scene).compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", float("nan")))
    nbytes = float(cost.get("bytes accessed", float("nan")))

    @jax.jit
    def run_steps(st):
        def body(i, s):
            s, _ = step(s, scene)
            return s

        st = jax.lax.fori_loop(0, args.iters, body, st)
        return jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(b), st.params, 0.0)

    v = float(run_steps(state))
    t0 = time.perf_counter()
    v = float(run_steps(state))
    dts = (time.perf_counter() - t0) / args.iters
    assert np.isfinite(v)
    t_mxu, t_hbm = flops / PEAK_BF16, nbytes / HBM_BW
    t_sol = max(t_mxu, t_hbm)
    rec = {
        "stage": f"full step B{args.batch}/A{args.actors}/L{args.lanes}",
        "measured_ms": round(dts * 1e3, 2),
        "gflops": round(flops / 1e9, 2),
        "hbm_gb": round(nbytes / 1e9, 3),
        "sol_mxu_ms": round(t_mxu * 1e3, 3),
        "sol_hbm_ms": round(t_hbm * 1e3, 3),
        "sol_ms": round(t_sol * 1e3, 3),
        "headroom_x": round(dts / t_sol, 1),
        "bound": "hbm" if t_hbm > t_mxu else "mxu",
        "achieved_gbps": round(nbytes / dts / 1e9, 1),
        "achieved_tflops": round(flops / dts / 1e12, 2),
    }
    results.append(rec)
    print(json.dumps(rec), flush=True)

    if args.stages:
        from trajsde_tpu.models import graph
        from trajsde_tpu.models.aggregator import GlobalInteractor
        from trajsde_tpu.models.decoders import SDEDecoder
        from trajsde_tpu.models.local_encoder import AAEncoder
        from trajsde_tpu.models.sde_encoder import LocalEncoderSDESep

        D, TH, TF, H, F = 64, 21, 60, 8, 10
        B, A = scene.x.shape[0], scene.x.shape[1]

        aa = AAEncoder(historical_steps=TH, embed_dim=D, num_heads=H, dtype=dt16)
        mask = graph.aa_masks(scene, 50.0)
        edge_vec = graph.aa_edge_vectors(scene)
        x_t = jnp.transpose(scene.x, (0, 2, 1, 3))
        rot = scene.rotate_mat()
        aa_in = (x_t, x_t, rot, scene.bos_mask, mask, edge_vec)
        pa = aa.init(jax.random.key(0), *aa_in)["params"]

        def aa_loss(p, k):
            return jnp.sum(
                aa.apply({"params": p}, *aa_in, False, rngs={"dropout": k}).astype(
                    jnp.float32
                )
            )

        analyze("AA fwd+bwd", aa_loss, pa, args.iters, True, results)

        enc = LocalEncoderSDESep(historical_steps=TH, embed_dim=D, num_heads=H, dtype=dt16)
        pe = enc.init({"params": jax.random.key(0), "sde": jax.random.key(1)}, scene)[
            "params"
        ]

        def enc_loss(p, k):
            out = enc.apply(
                {"params": p},
                scene,
                False,
                rngs={"sde": k, "dropout": jax.random.fold_in(k, 9)},
            )
            return jnp.sum(out[0]) + jnp.sum(out[1]) + jnp.sum(out[2])

        analyze("encoder fwd+bwd", enc_loss, pe, args.iters, True, results)

        agg = GlobalInteractor(
            historical_steps=TH, embed_dim=D, num_modes=F, num_heads=H, dtype=dt16
        )
        local = jax.random.normal(jax.random.key(4), (B, A, D))
        pg = agg.init(jax.random.key(0), scene, local)["params"]

        def agg_loss(p, k):
            return jnp.sum(
                agg.apply({"params": p}, scene, local, False, rngs={"dropout": k}).astype(
                    jnp.float32
                )
            )

        analyze("aggregator fwd+bwd", agg_loss, pg, args.iters, True, results)

        dec = SDEDecoder(
            local_channels=D, global_channels=D, future_steps=TF, num_modes=F, dtype=dt16
        )
        glob = jax.random.normal(jax.random.key(5), (B, F, A, D))
        pd = dec.init(
            {"params": jax.random.key(0), "sde": jax.random.key(1)}, scene, local, glob
        )["params"]

        def dec_loss(p, k):
            out = dec.apply({"params": p}, scene, local, glob, rngs={"sde": k})
            return jnp.sum(out["loc"].astype(jnp.float32)) + jnp.sum(
                out["pi"].astype(jnp.float32)
            )

        analyze("decoder fwd+bwd", dec_loss, pd, args.iters, True, results)

    print("== summary ==")
    for r in results:
        print(
            f"{r['stage']:32s} {r['measured_ms']:8.2f} ms | sol {r['sol_ms']:7.3f} ms "
            f"({r['bound']}) | headroom {r['headroom_x']}x | "
            f"{r['achieved_gbps']:7.1f} GB/s | {r['achieved_tflops']:6.2f} TF/s"
        )


if __name__ == "__main__":
    jax.config.update("jax_default_prng_impl", "rbg")
    print("devices:", jax.devices(), flush=True)
    main()
