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
    mesh=None,
    ood: bool = False,
):
    """Build ``serve(scene, key, seed) -> output dict`` (jitted).

    ``key`` drives the encoder's SDE path; ``seed`` (int32) seeds the
    decoder kernel's on-core PRNG (pass explicit noise only in tests).

    ``ood=True`` routes the encoder through its OOD ensemble scoring
    (``eval_iter`` stochastic re-runs, per-actor embedding stds — the
    reference's ``test.py --ood`` capability,
    ``enc_hivt_nusargo_sde_sep2.py:204-314``) and attaches ``stds``
    ``[B, A]`` to the output; predictions decode from the ensemble-MEAN
    embedding, exactly like the eval path
    (``models/prediction.py`` ``ood=True``).  Costs ~``eval_iter``×
    the encoder's share of the forward.

    ``increments='rademacher'`` (default) uses two-point ±√dt increments —
    weak order 1 like Euler–Maruyama itself, transcendental-free, and
    measured 1.7× faster than the XLA-scan gaussian rollout on v5e
    (2.94 ms vs 4.9 ms for 20480 rows × 60 steps).  Use
    ``increments='gaussian'`` for exact-path-law sampling (the XLA scan is
    the better engine for that regime).

    ``mesh`` (optional, 1-axis) runs the rollout kernel data-parallel:
    the Pallas call is an opaque custom call the SPMD partitioner cannot
    split, so it is wrapped in ``shard_map`` over the flattened ``B·F·A``
    row axis — each device rolls out its row block in its own VMEM; the
    encoder/aggregator/heads stay on the GSPMD path.  The mesh's device
    count must divide ``B·F·A`` (``mesh.make_mesh_for_batch(rows)``
    picks the largest such count).  With explicit ``noise`` the sharded
    result equals the unsharded one exactly (rows are just split); with
    the on-core PRNG each shard folds its ``axis_index`` into the seed —
    a different but identically distributed path sample per shard count,
    the same property as micro-batch grouping changing the key stream.
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
    if ood and not hasattr(model.encoder, "forward_ood"):
        raise NotImplementedError(
            f"ood=True needs an encoder with forward_ood (OOD ensemble "
            f"scoring); {type(model.encoder).__name__} has none"
        )
    kp = rollout_params_from_linen(params["params"]["decoder"]["sde_rollout"])
    t0s, dts = decoder.time_grid()
    Tf = decoder.future_steps

    def _rollout(y0r, seed, noise):
        kw = dict(num_steps=Tf, block_rows=block_rows, interpret=interpret,
                  unroll=unroll, increments=increments)
        if mesh is None:
            return sde_rollout(y0r, kp, t0s, dts, seed, noise=noise, **kw)

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]

        def _shard(y0s, seed_, noise_s):
            # decorrelate shards: each kernel call numbers its row tiles
            # from 0, so identical seeds would make every shard replay the
            # SAME on-core increment stream (correlated futures); folding
            # the shard index in gives independent streams (_step_seed's
            # avalanche decorrelates the arithmetic progression)
            sseed = seed_ + jax.lax.axis_index(axis) * jnp.int32(0x7F4A7C15)
            return sde_rollout(y0s, kp, t0s, dts, sseed, noise=noise_s, **kw)

        shmap = lambda f, in_specs: shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=P(None, axis),
            check_vma=False,
        )
        if noise is None:
            return shmap(
                lambda y0s, s: _shard(y0s, s, None), (P(axis), P())
            )(y0r, seed)
        # explicit noise [T, rows, D] splits by rows — sharded == unsharded
        return shmap(_shard, (P(axis), P(), P(None, axis)))(y0r, seed, noise)

    def method(m, scene: SceneBatch, seed, noise):
        if ood:
            # predictions decode from the ensemble-MEAN embedding, like
            # the eval path (models/prediction.py ood=True; reference
            # model_base_mix_sde.py:89-98)
            local, stds = m.encoder.forward_ood(scene, True)
        else:
            enc_out = m.encoder(scene, True)
            local = enc_out[0] if isinstance(enc_out, tuple) else enc_out
        glob = m.aggregator(scene, local, True)
        y0 = m.decoder.fuse(scene, local, glob)
        B, F, A, D = y0.shape
        sol = _rollout(
            # the kernel state is f32 regardless of the model's compute
            # dtype (mixed-precision models produce bf16 fusion output)
            y0.reshape(-1, D).astype(jnp.float32),
            seed,
            noise,
        )
        sol = jnp.transpose(sol.reshape(Tf, B, F, A, D), (1, 2, 3, 0, 4))
        out = m.decoder.decode(scene, sol, local, glob)
        # rotated targets like the training forward — lets the eval CLI
        # compute metrics through the serving engine (``--serving``)
        out["y"] = m._rotated_y(scene)
        if ood:
            out["stds"] = stds
        return out

    @jax.jit
    def serve(scene: SceneBatch, key, seed, noise=None):
        return model.apply(params, scene, seed, noise, method=method, rngs={"sde": key})

    return serve
