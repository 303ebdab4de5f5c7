"""Serving path: jitted inference with the fused Pallas decoder rollout.

Splices :func:`trajsde_tpu.ops.pallas.sde_rollout.sde_rollout` between the
decoder's ``fuse`` and ``decode`` stages (sharing the training
parameters), so the 60-step latent rollout — the serving hot loop — runs
as one VMEM-resident kernel (~4× the XLA-scan forward on v5e) while the
encoder/aggregator/heads stay on the standard XLA path.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from trajsde_tpu.data.scene import SceneBatch
from trajsde_tpu.ops.pallas.sde_rollout import rollout_params_from_linen, sde_rollout


def make_serving_fn(
    model,
    params: Dict[str, Any],
    block_rows: int = 1024,
    interpret: bool = False,
    unroll: int = 10,
    increments: str = "rademacher",
):
    """Build ``serve(scene, key, seed) -> output dict`` (jitted).

    ``key`` drives the encoder's SDE path; ``seed`` (int32) seeds the
    decoder kernel's on-core PRNG (pass explicit noise only in tests).

    ``increments='rademacher'`` (default) uses two-point ±√dt increments —
    weak order 1 like Euler–Maruyama itself, transcendental-free, and
    measured 1.7× faster than the XLA-scan gaussian rollout on v5e
    (2.94 ms vs 4.9 ms for 20480 rows × 60 steps).  Use
    ``increments='gaussian'`` for exact-path-law sampling (the XLA scan is
    the better engine for that regime).
    """
    from trajsde_tpu.models.decoders import SDEDecoder

    decoder = model.decoder
    if not isinstance(decoder, SDEDecoder):
        # MLPDecoder (and any non-SDE head) has no latent rollout to fuse;
        # without this check the failure is a cryptic KeyError on
        # 'sde_rollout' params deep in rollout_params_from_linen
        raise NotImplementedError(
            f"the Pallas serving engine requires SDEDecoder (model has "
            f"{type(decoder).__name__}); use the scan engine"
        )
    if getattr(decoder, "sde_layers", 2) != 2:
        # rollout_params_from_linen reads only the 2-layer topology; deeper
        # nets would silently serve a TRUNCATED MLP (same guard as
        # SDEDecoder(fused=True))
        raise NotImplementedError(
            "the Pallas serving rollout hardcodes sde_layers=2 "
            f"(decoder has {decoder.sde_layers}); use the scan engine"
        )
    kp = rollout_params_from_linen(params["params"]["decoder"]["sde_rollout"])
    t0s, dts = decoder.time_grid()
    Tf = decoder.future_steps

    def method(m, scene: SceneBatch, seed, noise):
        enc_out = m.encoder(scene, True)
        local = enc_out[0] if isinstance(enc_out, tuple) else enc_out
        glob = m.aggregator(scene, local, True)
        y0 = m.decoder.fuse(scene, local, glob)
        B, F, A, D = y0.shape
        sol = sde_rollout(
            # the kernel state is f32 regardless of the model's compute
            # dtype (mixed-precision models produce bf16 fusion output)
            y0.reshape(-1, D).astype(jnp.float32),
            kp,
            t0s,
            dts,
            seed,
            num_steps=Tf,
            block_rows=block_rows,
            interpret=interpret,
            noise=noise,
            unroll=unroll,
            increments=increments,
        )
        sol = jnp.transpose(sol.reshape(Tf, B, F, A, D), (1, 2, 3, 0, 4))
        out = m.decoder.decode(scene, sol, local, glob)
        # rotated targets like the training forward — lets the eval CLI
        # compute metrics through the serving engine (``--serving``)
        out["y"] = m._rotated_y(scene)
        return out

    @jax.jit
    def serve(scene: SceneBatch, key, seed, noise=None):
        return model.apply(params, scene, seed, noise, method=method, rngs={"sde": key})

    return serve
