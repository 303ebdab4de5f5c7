"""Fused Euler–Maruyama rollout as a single Pallas TPU kernel.

The decoder's 60-step latent-SDE rollout (``dec_hivt_nusargo_sde.py:88``)
is the serving-path hot loop.  The ``lax.scan`` formulation round-trips
the state and per-step MLP activations through HBM every step; this kernel
keeps the state tile and ALL drift/diffusion weights resident in VMEM for
the whole trajectory — one HBM read of ``y0`` + weights, one HBM write per
step of the output — and generates Brownian increments on-core with the
TPU PRNG (Box–Muller over ``prng_random_bits``).

Layout: rows = flattened ``B·F·A`` samples (tiled by ``block_rows``),
lanes = the latent dim (64).  Per step, the drift MLP
(``Linear(D+2→D) + sde_layers×(tanh, Linear(D→D))``) and the scalar
diffusion MLP run as ``[R,D]×[D,D]`` MXU matmuls; the ``sin t``/``cos t``
time features enter as precomputed per-step rank-1 bias terms, avoiding
the concat.

Training keeps the differentiable scan path; this kernel is the
inference/serving fast path (both paths share the same parameters — see
:func:`rollout_params_from_linen`).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN2PI = float(np.log(2.0 * np.pi))


def _uniform(shape):
    """(0,1) uniforms from the on-core PRNG (24-bit mantissa path).

    ``prng_random_bits`` yields signed int32 — bitcast to uint32 BEFORE the
    shift so it is logical, not arithmetic (sign extension would fold half
    the mass onto the clip boundary and break Box–Muller).
    """
    bits = pltpu.prng_random_bits(shape)  # int32
    # LOGICAL shift (an arithmetic >> would sign-extend and fold half the
    # mass onto the clip boundary, breaking Box–Muller); the result fits in
    # 24 bits, so the int32→f32 cast is exact
    mant = jax.lax.shift_right_logical(bits, 8)
    u = mant.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.clip(u, 1.0 / (1 << 24), 1.0 - 1.0 / (1 << 24))


def _normal(shape):
    """Standard normals via pair-output Box–Muller.

    Both branches (r·cos, r·sin) of each (u1, u2) draw are used, so the
    log/sqrt/cos/sin evaluations and PRNG draws run on HALF-row tiles —
    transcendental cost on the VPU is per-vreg, so the half tiles must
    stay full 128-lane width (split on the sublane axis, then stack).
    """
    R, D = shape
    if R % 2:
        u1 = _uniform(shape)
        u2 = _uniform(shape)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        return r * jnp.cos(2.0 * jnp.pi * u2)
    half = (R // 2, D)
    u1 = _uniform(half)
    u2 = _uniform(half)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = 2.0 * jnp.pi * u2
    return jnp.concatenate([r * jnp.cos(a), r * jnp.sin(a)], axis=0)


def _rademacher(shape):
    """±1 two-point increments — weak-order-1 Euler keeps its convergence
    order under any zero-mean unit-variance increment; one PRNG draw and
    zero transcendentals (vs Box–Muller's log/sqrt/cos)."""
    bits = pltpu.prng_random_bits(shape)
    return jnp.where((bits & 1) == 0, -1.0, 1.0).astype(jnp.float32)


W_ROLLOUT_ORDER = (
    "wf0", "wf0t", "bf0", "wf1", "bf1", "wf2", "bf2",
    "wg0", "wg0t", "bg0", "wg1", "bg1", "wgo", "bgo",
)


def _euler_step(y, s, c, dt, sqrt_dt, z, ws):
    """One Euler–Maruyama step (pure jnp — shared by the forward kernel,
    the backward kernel's in-kernel ``jax.vjp``, and the test reference).

    drift MLP: dense0 (+ time-feature rank-1 terms) → tanh → dense1 → tanh
    → dense2; diffusion MLP → scalar sigmoid (``dec_hivt_nusargo_sde.py``).
    """
    (wf0, wf0t, bf0, wf1, bf1, wf2, bf2,
     wg0, wg0t, bg0, wg1, bg1, wgo, bgo) = ws
    tf = s * wf0t[0, :] + c * wf0t[1, :]
    h = jnp.dot(y, wf0, preferred_element_type=jnp.float32)
    h = jnp.tanh(h + tf + bf0[0, :])
    h = jnp.dot(h, wf1, preferred_element_type=jnp.float32)
    h = jnp.tanh(h + bf1[0, :])
    f = jnp.dot(h, wf2, preferred_element_type=jnp.float32) + bf2[0, :]

    tg = s * wg0t[0, :] + c * wg0t[1, :]
    hg = jnp.dot(y, wg0, preferred_element_type=jnp.float32)
    hg = jnp.tanh(hg + tg + bg0[0, :])
    hg = jnp.dot(hg, wg1, preferred_element_type=jnp.float32)
    hg = jnp.tanh(hg + bg1[0, :])
    g = jax.nn.sigmoid(
        jnp.dot(hg, wgo, preferred_element_type=jnp.float32) + bgo[0, :]
    )  # [R, 1]
    return y + f * dt + g * (sqrt_dt * z)


def _draw(shape, increments: str):
    return _normal(shape) if increments == "gaussian" else _rademacher(shape)


def _step_seed(seed, tile, t):
    """Decorrelated per-(seed, tile, step) PRNG seed.

    The naive ``seed + tile*T + t`` makes adjacent user seeds replay each
    other's stream shifted by one step (seed s+1 at step t == seed s at
    step t+1) — K futures drawn with sequential seeds would be heavily
    correlated.  murmur3's fmix32 finalizer avalanche breaks that.  Must
    be IDENTICAL in the forward and backward kernels: the custom VJP
    regenerates the increments from this seeding.  (Signed-wrapping int32
    constants; logical shifts per the Mosaic rule — never ``>>``.)
    """
    h = (
        jnp.asarray(seed, jnp.int32)
        + jnp.asarray(tile, jnp.int32) * np.int32(-1640531527)  # 0x9E3779B9
        + jnp.asarray(t, jnp.int32) * np.int32(-1028477387)     # 0xC2B2AE35
    )
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * np.int32(-2048144789)  # 0x85EBCA6B
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * np.int32(-1028477387)  # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h


def _rollout_kernel(
    # scalar-prefetch
    seed_ref,
    # inputs
    y0_ref, sin_ref, cos_ref, t_dt_ref,
    *refs,
    num_steps: int,
    unroll: int,
    use_prng: bool,
    increments: str,
):
    """Grid = (row tiles, step blocks); the carry lives in a VMEM scratch.

    One grid iteration = ``unroll`` Euler–Maruyama steps on one row tile,
    writing that block's outputs — VMEM holds only the carry + one output
    block regardless of trajectory length, so tiles can be MXU-sized while
    grid overhead stays at (tiles × steps/unroll) iterations.
    Weight blocks are grid-invariant (fetched once).

    The PRNG is re-seeded per (tile, step) — random access, so the custom
    VJP can regenerate the exact increments during the backward sweep
    without materializing them in HBM.
    """
    n_w = len(W_ROLLOUT_ORDER)
    w_refs = refs[:n_w]
    refs = refs[n_w:]
    if use_prng:
        out_ref, y_ref = refs
    else:
        noise_ref, out_ref, y_ref = refs
    tb = pl.program_id(1)
    ws = tuple(w[:] for w in w_refs)

    @pl.when(tb == 0)
    def _():
        y_ref[:] = y0_ref[:]

    y = y_ref[:]
    for k in range(unroll):
        t = tb * unroll + k
        if use_prng:
            pltpu.prng_seed(_step_seed(seed_ref[0], pl.program_id(0), t))
            z = _draw(y.shape, increments)
        else:
            z = noise_ref[k, :, :]
        y = _euler_step(
            y, sin_ref[t, 0], cos_ref[t, 0], t_dt_ref[t, 0], t_dt_ref[t, 1], z, ws
        )
        out_ref[k, :, :] = y
    y_ref[:] = y


def _rollout_bwd_kernel(
    # scalar-prefetch
    seed_ref,
    # inputs
    yprev_ref, ct_ref, sin_ref, cos_ref, t_dt_ref,
    *refs,
    num_steps: int,
    unroll: int,
    use_prng: bool,
    increments: str,
    n_blocks: int,
):
    """Reverse sweep: grid = (row tiles, step blocks BACKWARD).

    Carry λ (the cotangent of the running state) lives in a VMEM scratch;
    each iteration replays ``unroll`` steps of the forward chain via
    ``jax.vjp`` — the pre-step states come from the forward's own outputs
    (``yprev[t] = y_t``) and the Brownian increments are regenerated from
    the per-(tile, step) PRNG seeding, so NO residual beyond the states
    the forward already emits ever touches HBM.
    """
    n_w = len(W_ROLLOUT_ORDER)
    w_refs = refs[:n_w]
    refs = refs[n_w:]
    if use_prng:
        (dy0_ref, *dw_refs), lam_ref = refs[:-1], refs[-1]
    else:
        noise_ref = refs[0]
        (dy0_ref, *dw_refs), lam_ref = refs[1:-1], refs[-1]
    ws = tuple(w[:] for w in w_refs)
    tb = pl.program_id(1)
    first = (pl.program_id(0) == 0) & (tb == 0)

    @pl.when(tb == 0)
    def _():
        lam_ref[:] = jnp.zeros(lam_ref.shape, lam_ref.dtype)

    @pl.when(first)
    def _():
        for ref in dw_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    lam = lam_ref[:]
    rb = n_blocks - 1 - tb  # forward step-block replayed by this iteration
    for k in range(unroll - 1, -1, -1):
        t = rb * unroll + k
        if use_prng:
            pltpu.prng_seed(_step_seed(seed_ref[0], pl.program_id(0), t))
            z = _draw(lam.shape, increments)
        else:
            z = noise_ref[k, :, :]
        y_t = yprev_ref[k, :, :]
        s = sin_ref[t, 0]
        c = cos_ref[t, 0]
        dt = t_dt_ref[t, 0]
        sqrt_dt = t_dt_ref[t, 1]

        lam = lam + ct_ref[k, :, :]  # cotangent injected at out[t] = y_{t+1}

        def step_fn(y_, *ws_):
            return _euler_step(y_, s, c, dt, sqrt_dt, z, ws_)

        _, vjp_fn = jax.vjp(step_fn, y_t, *ws)
        grads = vjp_fn(lam)
        lam = grads[0]
        for ref, gval in zip(dw_refs, grads[1:]):
            ref[...] = ref[...] + gval.astype(jnp.float32)

    lam_ref[:] = lam

    @pl.when(tb == n_blocks - 1)
    def _():
        dy0_ref[:] = lam_ref[:]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4)
)
def _rollout_train(num_steps, block_rows, unroll, interpret, increments,
                   y0, ws, t0s, dts, seed, noise):
    return _rollout_fwd_call(
        num_steps, block_rows, unroll, interpret, increments,
        y0, ws, t0s, dts, seed, noise,
    )


def _rollout_train_fwd(num_steps, block_rows, unroll, interpret, increments,
                       y0, ws, t0s, dts, seed, noise):
    ys = _rollout_train(
        num_steps, block_rows, unroll, interpret, increments,
        y0, ws, t0s, dts, seed, noise,
    )
    return ys, (y0, ws, t0s, dts, seed, noise, ys)


def _rollout_train_bwd(num_steps, block_rows, unroll, interpret, increments,
                       res, ct):
    y0, ws, t0s, dts, seed, noise, ys = res
    N, D = y0.shape
    R = min(block_rows, N)
    pad = (-N) % R
    # pre-step states: yprev[t] = y_t (zero-padded rows carry zero λ)
    yprev = jnp.concatenate([y0[None], ys[:-1]], axis=0)
    if pad:
        zcols = jnp.zeros((num_steps, pad, D), jnp.float32)
        yprev = jnp.concatenate([yprev, zcols], axis=1)
        ct = jnp.concatenate([ct.astype(jnp.float32), zcols], axis=1)
        if noise is not None:
            noise = jnp.concatenate([noise.astype(jnp.float32), zcols], axis=1)
    else:
        ct = ct.astype(jnp.float32)
    Np = yprev.shape[1]
    u = unroll
    while num_steps % u:
        u -= 1
    n_blocks = num_steps // u
    use_prng = noise is None

    sin_t = jnp.sin(t0s)[:, None].astype(jnp.float32)
    cos_t = jnp.cos(t0s)[:, None].astype(jnp.float32)
    t_dt = jnp.stack([dts, jnp.sqrt(dts)], axis=-1).astype(jnp.float32)

    def w_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda i, t, s, _n=arr.ndim: (0,) * _n,
            memory_space=pltpu.VMEM,
        )

    rev_blk = pl.BlockSpec(
        (u, R, D), lambda i, t, s, _nb=n_blocks: (_nb - 1 - t, i, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [rev_blk, rev_blk, w_spec(sin_t), w_spec(cos_t), w_spec(t_dt)]
    in_specs += [w_spec(w) for w in ws]
    inputs = [yprev, ct, sin_t, cos_t, t_dt, *ws]
    if not use_prng:
        in_specs.append(rev_blk)
        inputs.append(noise)

    out_shapes = (
        jax.ShapeDtypeStruct((Np, D), jnp.float32),  # dy0
    ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws)
    out_specs = (
        pl.BlockSpec((R, D), lambda i, t, s: (i, 0), memory_space=pltpu.VMEM),
    ) + tuple(w_spec(w) for w in ws)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // R, n_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((R, D), jnp.float32)],
    )
    outs = pl.pallas_call(
        functools.partial(
            _rollout_bwd_kernel,
            num_steps=num_steps, unroll=u, use_prng=use_prng,
            increments=increments, n_blocks=n_blocks,
        ),
        out_shape=out_shapes,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(jnp.atleast_1d(seed).astype(jnp.int32), *inputs)

    dy0 = outs[0][:N].astype(y0.dtype)
    dws = tuple(d.astype(w.dtype) for d, w in zip(outs[1:], ws))
    dseed = np.zeros((), jax.dtypes.float0)
    dnoise = None if noise is None else jnp.zeros_like(noise)
    return (dy0, dws, jnp.zeros_like(t0s), jnp.zeros_like(dts), dseed, dnoise)


_rollout_train.defvjp(_rollout_train_fwd, _rollout_train_bwd)


def sde_rollout_train(
    y0: jax.Array,
    params: Dict[str, jax.Array],
    t0s: jax.Array,
    dts: jax.Array,
    seed: jax.Array,
    num_steps: int,
    block_rows: int = 1024,
    interpret: bool = False,
    noise: jax.Array = None,
    unroll: int = 6,
    increments: str = "gaussian",
) -> jax.Array:
    """Differentiable fused rollout: forward as :func:`sde_rollout`, backward
    as a second VMEM-resident kernel (reverse sweep, λ carry in scratch,
    increments regenerated from the per-(tile, step) PRNG seeding).

    The XLA ``lax.scan`` path materializes ~6 per-step MLP residuals in HBM
    and reads them back in the backward; here the only HBM traffic beyond
    the forward's own outputs is one read of (states, cotangents) per step.

    Gradients are defined with respect to ``y0`` and ``params`` ONLY —
    ``t0s``/``dts``/``noise`` are explicitly ``stop_gradient``-ed (the
    backward kernel does not compute their cotangents), so a learnable
    time grid or a pathwise-noise objective must use the XLA scan path.
    """
    ws = tuple(params[k] for k in W_ROLLOUT_ORDER)
    sg = jax.lax.stop_gradient
    # normalize the seed BEFORE the custom_vjp boundary: the backward
    # returns a shape-() float0 cotangent, so a shape-(1,) primal seed
    # would fail the vjp structure check
    seed = jnp.asarray(seed, jnp.int32).reshape(())
    return _rollout_train(
        num_steps, block_rows, unroll, interpret, increments,
        y0, ws, sg(t0s), sg(dts), seed,
        None if noise is None else sg(noise),
    )


def _rollout_fwd_call(num_steps, block_rows, unroll, interpret, increments,
                      y0, ws, t0s, dts, seed, noise):
    params = dict(zip(W_ROLLOUT_ORDER, ws))
    return sde_rollout(
        y0, params, t0s, dts, seed, num_steps=num_steps,
        block_rows=block_rows, interpret=interpret, noise=noise,
        unroll=unroll, increments=increments,
    )


def rollout_params_from_linen(step_params: Dict) -> Dict[str, jax.Array]:
    """Split the linen ``SDEStep`` parameters for the kernel layout.

    ``dense0`` kernels are [D+2, D]: rows 0..D-1 multiply ``y``, rows D/D+1
    multiply ``sin t`` / ``cos t`` (matching ``_time_feats`` concat order in
    :mod:`trajsde_tpu.models.sde`).
    """
    f, g = step_params["f_func"], step_params["g_func"]
    D = f["dense0"]["kernel"].shape[1]
    return dict(
        wf0=f["dense0"]["kernel"][:D],
        wf0t=f["dense0"]["kernel"][D:],
        bf0=f["dense0"]["bias"][None],
        wf1=f["dense1"]["kernel"],
        bf1=f["dense1"]["bias"][None],
        wf2=f["dense2"]["kernel"],
        bf2=f["dense2"]["bias"][None],
        wg0=g["dense0"]["kernel"][:D],
        wg0t=g["dense0"]["kernel"][D:],
        bg0=g["dense0"]["bias"][None],
        wg1=g["dense1"]["kernel"],
        bg1=g["dense1"]["bias"][None],
        wgo=g["dense_out"]["kernel"],
        bgo=g["dense_out"]["bias"][None],
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "block_rows", "interpret", "unroll", "increments"),
)
def sde_rollout(
    y0: jax.Array,            # [N, D]
    params: Dict[str, jax.Array],
    t0s: jax.Array,           # [T]
    dts: jax.Array,           # [T]
    seed: jax.Array,          # int32 scalar
    num_steps: int,
    block_rows: int = 1024,
    interpret: bool = False,
    noise: jax.Array = None,  # optional [T, N, D] explicit increments
    unroll: int = 6,
    increments: str = "gaussian",
) -> jax.Array:
    """Run the fused rollout; returns ``ys [T, N, D]`` (post-step states).

    ``noise=None`` draws Brownian increments from the on-core TPU PRNG —
    ``increments='gaussian'`` (Box–Muller) or ``'rademacher'`` (two-point,
    weak-order-1-preserving and transcendental-free).  Passing explicit
    standard normals supports determinism tests and the CPU interpreter
    (which lacks the PRNG primitives).
    """
    N, D = y0.shape
    R = min(block_rows, N)
    pad = (-N) % R
    if pad:
        y0 = jnp.concatenate([y0, jnp.zeros((pad, D), y0.dtype)])
        if noise is not None:
            noise = jnp.concatenate(
                [noise, jnp.zeros((num_steps, pad, D), noise.dtype)], axis=1
            )
    Np = y0.shape[0]
    use_prng = noise is None
    while num_steps % unroll:
        unroll -= 1

    sin_t = jnp.sin(t0s)[:, None].astype(jnp.float32)
    cos_t = jnp.cos(t0s)[:, None].astype(jnp.float32)
    t_dt = jnp.stack([dts, jnp.sqrt(dts)], axis=-1).astype(jnp.float32)

    def w_spec(arr):
        # index maps under PrefetchScalarGridSpec receive (grid idx, scalar refs)
        return pl.BlockSpec(
            arr.shape, lambda i, t, s: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    p = params
    weights = [
        p["wf0"], p["wf0t"], p["bf0"], p["wf1"], p["bf1"], p["wf2"], p["bf2"],
        p["wg0"], p["wg0t"], p["bg0"], p["wg1"], p["bg1"], p["wgo"], p["bgo"],
    ]

    in_specs = [
        pl.BlockSpec((R, D), lambda i, t, s: (i, 0), memory_space=pltpu.VMEM),
        w_spec(sin_t),
        w_spec(cos_t),
        w_spec(t_dt),
        *[w_spec(w) for w in weights],
    ]
    inputs = [y0, sin_t, cos_t, t_dt, *weights]
    if not use_prng:
        in_specs.append(
            pl.BlockSpec(
                (unroll, R, D), lambda i, t, s: (t, i, 0), memory_space=pltpu.VMEM
            )
        )
        inputs.append(noise.astype(jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Np // R, num_steps // unroll),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (unroll, R, D), lambda i, t, s: (t, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((R, D), jnp.float32)],
    )

    out = pl.pallas_call(
        functools.partial(
            _rollout_kernel,
            num_steps=num_steps,
            unroll=unroll,
            use_prng=use_prng,
            increments=increments,
        ),
        out_shape=jax.ShapeDtypeStruct((num_steps, Np, D), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.atleast_1d(seed).astype(jnp.int32), *inputs)
    return out[:, :N]
