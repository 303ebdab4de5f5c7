"""Fused AA pair-chain with a hand-rolled VJP (training hot spot killer).

The AA block's FLOPs live in a 3-layer MLP + k/v projection evaluated on
every (receiver, sender) pair (``enc_hivt_nusargo_grid.py:178-194``).  The
XLA backward materializes several ``[B·T·Aq·Ak, 128]`` residuals in HBM —
round-1 profiling put this at ~55% of the whole train step.  This op:

* **forward**: one Pallas kernel per (scene, step-chunk) tile runs the
  packed pair chain (embedding MLPs → k/v → masked per-head softmax →
  aggregate) entirely in VMEM; HBM sees only the tiny inputs
  (``u [.., 4]``, ``q``, masks) and the ``[B, T, Aq, D]`` aggregate.
* **backward**: a custom VJP whose kernel RECOMPUTES the chain in VMEM
  (flash-attention-style) and emits input grads per tile plus weight
  grads accumulated across the sequential grid — no pair-sized residual
  ever touches HBM.
* attention dropout (``attn_drop``, ``enc_hivt_nusargo_grid.py:193``) is
  an explicit 0/1 keep-mask input so forward and backward see the same
  mask and the op stays testable in interpret mode on CPU.

The op covers the reference ``propagate`` stage (message + aggregate);
node-wise work around it (center embed, q projection, gating, out_proj,
FFN) stays in XLA where it is already fusion-friendly.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


NEG = -1e9

# packed weight order (see pack_aa_params in aa_attention.py for layout)
W_ORDER = (
    "wu", "bu", "ln0s", "ln0b", "w1", "b1",
    "lna0s", "lna0b", "wagg", "bagg", "lna1s", "lna1b",
    "wkv", "bkv",
)


class FusedCfg(NamedTuple):
    """Static configuration (hashable — custom_vjp nondiff arg).

    ``rows_fwd`` / ``rows_bwd`` are per-tile row budgets: the chain is
    purely row-wise, so the flattened ``T·Aq`` receiver axis is chunked by
    its largest divisor ≤ the budget.  The backward tile must be smaller —
    its VJP residuals roughly double the VMEM live set (the forward fits
    ~1000 pair-rows in the 16 MB scoped limit; the backward ~650)."""

    Aq: int
    Ak: int
    D: int
    H: int
    rows_fwd: int
    rows_bwd: int
    dropout_rate: float
    dtype: str
    interpret: bool
    ln_mm: bool = False  # LN statistics via MXU ones-matmuls (VPU relief)


def _relu(x):
    """ReLU whose fwd AND transpose compare in f32 — Mosaic cannot lower
    bf16 vector comparisons on this target."""
    pred = x.astype(jnp.float32) > 0.0
    return jnp.where(pred, x, jnp.zeros_like(x))


def _head_selector(D: int, H: int) -> jax.Array:
    """[D, H] one-hot head selector built from 2-D iota (TPU-safe)."""
    hd = D // H
    row = jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
    col = jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
    return (row == col).astype(jnp.float32)


def _ln_lean(x, scale, bias, out_dtype, eps=1e-5):
    """LayerNorm on an f32 tensor, emitting ``out_dtype`` — the cast rides
    the final elementwise op instead of being its own full-tensor pass."""
    m = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - m
    v = jnp.mean(xc * xc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(v + eps)
    return ((xc * inv) * scale + bias).astype(out_dtype)


def _mean_mat(W: int, halves: bool) -> jax.Array:
    """[W, W] averaging matrix: x @ M replicates per-row means across the
    lane axis in ONE MXU pass (vs log-W cross-lane VPU shuffles).
    ``halves=True`` builds the block-diagonal version normalizing each
    W/2-half independently (the packed two-stream embedding layout)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    if halves:
        same = (r < W // 2) == (c < W // 2)
        return same.astype(jnp.float32) * (2.0 / W)
    return jnp.full((W, W), 1.0 / W, jnp.float32)


def _ln_mm(x, scale, bias, out_dtype, mean_mat, stats_dtype, eps=1e-5):
    """LayerNorm with matmul-computed statistics (MXU instead of VPU
    reductions); ``mean_mat`` from :func:`_mean_mat`.  Statistics matmuls
    run in ``stats_dtype`` (bf16 under mixed precision — same error class
    as XLA's bf16 LN)."""
    xm = x.astype(stats_dtype)
    m = jnp.dot(xm, mean_mat.astype(stats_dtype), preferred_element_type=jnp.float32)
    xc = x - m
    xc2 = (xc * xc).astype(stats_dtype)
    v = jnp.dot(xc2, mean_mat.astype(stats_dtype), preferred_element_type=jnp.float32)
    inv = jax.lax.rsqrt(v + eps)
    return ((xc * inv) * scale + bias).astype(out_dtype)


def pair_chain(q, u, mask_f, keep, ws, *, Ak, H, dropout_rate, dtype,
               use_repeat: bool = False, ln_mm: bool = False):
    """The full pair chain on one tile (pure jnp — shared by the forward
    kernel, the in-kernel VJP recompute, and the test reference).

    q [R, D] · u [R·Ak, 4] · mask_f [R, Ak] · keep [R·Ak, H] or None.
    Returns the pre-gating aggregate [R, D] (f32).

    VPU-lean design: an f32 spine (matmul accumulators must be 32-bit on
    Mosaic) with casts only where they feed the big ``[P, 128]`` matmuls,
    LN emitting the cast inline, the MXU-hostile K=4 first layer as four
    rank-1 outer products, and a flat [P, ·] attention layout — the small
    [R, Ak, H] softmax is the only grouped tensor.  ``use_repeat`` swaps
    the head-expand matmul for ``pltpu.repeat`` (forward kernel only — the
    backward's in-kernel ``jax.vjp`` needs jnp-differentiable ops).
    """
    R, D = q.shape
    cdt = jnp.dtype(dtype)
    scale = 1.0 / np.sqrt(D // H)
    hd = D // H
    wu, bu, ln0s, ln0b, w1, b1, lna0s, lna0b, wagg, bagg, lna1s, lna1b, wkv, bkv = ws

    def mm(a, w, b):
        return jnp.dot(a, w.astype(a.dtype), preferred_element_type=jnp.float32) + b[0]

    # first layer: K=4 would waste the 128-deep MXU — four outer products
    # on the VPU instead
    h = bu[0] + sum(u[:, k : k + 1] * wu[k : k + 1, :] for k in range(4))
    if ln_mm:
        m2d = _mean_mat(2 * D, halves=True)
        md = _mean_mat(D, halves=False)
        a0 = _relu(_ln_mm(h, ln0s[0], ln0b[0], cdt, m2d, cdt))
        z1 = mm(a0, w1, b1)                              # [P, 2D] f32
        a1 = _relu(
            _ln_mm(z1[:, :D] + z1[:, D:], lna0s[0], lna0b[0], cdt, md, cdt)
        )
        nbr = _ln_mm(mm(a1, wagg, bagg), lna1s[0], lna1b[0], cdt, md, cdt)
    else:
        h0 = _ln_lean(h[:, :D], ln0s[0, :D], ln0b[0, :D], cdt)
        h1 = _ln_lean(h[:, D:], ln0s[0, D:], ln0b[0, D:], cdt)
        a0 = _relu(jnp.concatenate([h0, h1], axis=-1))   # [P, 2D] cdt
        z1 = mm(a0, w1, b1)                              # [P, 2D] f32
        a1 = _relu(_ln_lean(z1[:, :D] + z1[:, D:], lna0s[0], lna0b[0], cdt))
        nbr = _ln_lean(mm(a1, wagg, bagg), lna1s[0], lna1b[0], cdt)
    kv = mm(nbr, wkv, bkv)                               # [P, 2D] f32

    q_exp = jnp.broadcast_to(q[:, None, :], (R, Ak, D)).reshape(R * Ak, D)
    hsel = _head_selector(D, H)
    logits = jnp.dot(
        kv[:, :D] * q_exp, hsel, preferred_element_type=jnp.float32
    ) * scale                                            # [P, H] f32
    lg = logits.reshape(R, Ak, H)
    lg = jnp.where(mask_f[:, :, None] > 0, lg, NEG)
    m = jnp.max(lg, axis=1, keepdims=True)
    e = jnp.exp(lg - m) * mask_f[:, :, None]
    alpha = (e / jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)).reshape(
        R * Ak, H
    )
    if keep is not None:
        alpha = alpha * (keep * (1.0 / (1.0 - dropout_rate)))
    if use_repeat:
        att = pltpu.repeat(alpha, hd, 1)                 # [P, D] head expand
    else:
        att = jnp.dot(alpha, hsel.T, preferred_element_type=jnp.float32)
    prod = (att * kv[:, D:]).reshape(R, Ak, D)
    return jnp.sum(prod, axis=1)                         # [R, D] f32


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _fwd_kernel(q_ref, u_ref, mask_ref, *rest, cfg: FusedCfg, has_keep: bool):
    if has_keep:
        keep_ref, *w_refs, out_ref = rest
        keep = keep_ref[0, 0]
    else:
        keep = None
        *w_refs, out_ref = rest
    ws = tuple(w[:] for w in w_refs)
    out_ref[0, 0] = pair_chain(
        q_ref[0, 0], u_ref[0, 0], mask_ref[0, 0], keep, ws,
        Ak=cfg.Ak, H=cfg.H, dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
        use_repeat=not cfg.interpret, ln_mm=cfg.ln_mm,
    )


def _bwd_kernel(q_ref, u_ref, mask_ref, *rest, cfg: FusedCfg, has_keep: bool):
    n_w = len(W_ORDER)
    if has_keep:
        keep_ref = rest[0]
        rest = rest[1:]
        keep = keep_ref[0, 0]
    else:
        keep = None
    w_refs, (g_ref, dq_ref), dw_refs = (
        rest[:n_w], rest[n_w : n_w + 2], rest[n_w + 2 :]
    )
    ws = tuple(w[:] for w in w_refs)
    mask = mask_ref[0, 0]
    u = u_ref[0, 0]

    # u (the rotated pair features) is a pure function of the SCENE — no
    # parameter ever feeds it (build_pair_features consumes x_k/edge_vec/
    # rot straight from SceneBatch), so its cotangent is never consumed.
    # Closing over it keeps the K=4 first layer's transposed outer
    # products (cross-lane reductions) out of the VJP entirely.
    def f(q_, *ws_):
        return pair_chain(
            q_, u, mask, keep, ws_,
            Ak=cfg.Ak, H=cfg.H, dropout_rate=cfg.dropout_rate, dtype=cfg.dtype,
            ln_mm=cfg.ln_mm,
        )

    _, vjp_fn = jax.vjp(f, q_ref[0, 0], *ws)
    grads = vjp_fn(g_ref[0, 0])
    dq_ref[0, 0] = grads[0]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for ref, gval in zip(dw_refs, grads[1:]):
        gval32 = gval.astype(jnp.float32)

        @pl.when(first)
        def _(ref=ref, gval32=gval32):
            ref[...] = gval32

        @pl.when(jnp.logical_not(first))
        def _(ref=ref, gval32=gval32):
            ref[...] = ref[...] + gval32


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------
def _specs(rows, P, Ak, D, H, ws, has_keep):
    def blk(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            (1, 1) + shape, lambda b, t: (b, t) + (0,) * nd, memory_space=pltpu.VMEM
        )

    def w_spec(arr):
        return pl.BlockSpec(
            arr.shape, lambda b, t, _n=arr.ndim: (0,) * _n, memory_space=pltpu.VMEM
        )

    specs = [blk(rows, D), blk(P, 4), blk(rows, Ak)]
    if has_keep:
        # [P, H] layout: the in-kernel reshape to [R, Ak, H] then only
        # splits the leading (sublane) dim, which Mosaic supports
        specs.append(blk(P, H))
    specs += [w_spec(w) for w in ws]
    return specs, blk, w_spec


def _pick_rows(R_tot: int, target: int) -> int:
    """Row-tile size: the target, shrunk only if it exceeds the (padded)
    row count.  The row axis is zero-padded up to a multiple of the tile,
    so MXU-friendly sizes (64/128/256) are always available even though
    ``T·Aq`` (21·33 = 693 for the SDE encoder) has awkward divisors.
    Zero-padding is exact: a padded row has ``mask == 0`` everywhere, so
    its aggregate, input grads, and weight-grad contributions are all 0."""
    return min(target, R_tot)


def _pad_rows(x, R_tot: int, R_pad: int, axis: int = 1):
    if R_pad == R_tot:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, R_pad - R_tot)
    return jnp.pad(x, widths)


def _row_tiles(cfg, q, u, mask_f, keep, rows):
    """Flatten [B, T, Aq, ...] onto a chunked row axis [B, NC, rows, ...],
    zero-padding the flattened T·Aq axis to a multiple of ``rows``.

    The chain is purely row-wise so the receiver axis can be tiled freely —
    grid iterations pipeline within one kernel launch.
    """
    B, T, Aq, D = q.shape
    Ak, H = cfg.Ak, cfg.H
    R_tot = T * Aq
    NC = -(-R_tot // rows)
    R_pad = NC * rows
    P = rows * Ak
    qt = _pad_rows(q.reshape(B, R_tot, D), R_tot, R_pad).reshape(B, NC, rows, D)
    ut = _pad_rows(u.reshape(B, R_tot, Ak * 4), R_tot, R_pad).reshape(B, NC, P, 4)
    mt = _pad_rows(mask_f.reshape(B, R_tot, Ak), R_tot, R_pad).reshape(
        B, NC, rows, Ak
    )
    kt = (
        None
        if keep is None
        else _pad_rows(keep.reshape(B, R_tot, Ak * H), R_tot, R_pad).reshape(
            B, NC, P, H
        )
    )
    return NC, P, qt, ut, mt, kt


def _fwd_call(cfg: FusedCfg, q, u, mask_f, keep, ws):
    B, T, Aq, D = q.shape
    Ak, H = cfg.Ak, cfg.H
    rows = _pick_rows(T * Aq, cfg.rows_fwd)
    NC, P, qt, ut, mt, kt = _row_tiles(cfg, q, u, mask_f, keep, rows)

    args = [qt, ut, mt] + ([kt] if kt is not None else []) + list(ws)
    in_specs, blk, _ = _specs(rows, P, Ak, D, H, ws, kt is not None)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, has_keep=kt is not None),
        grid=(B, NC),
        out_shape=jax.ShapeDtypeStruct((B, NC, rows, D), jnp.float32),
        in_specs=in_specs,
        out_specs=blk(rows, D),
        interpret=cfg.interpret,
        compiler_params=None if cfg.interpret else pltpu.CompilerParams(
            # big row tiles (128+) need more than the conservative 16 MB
            # default; v5e has 128 MB VMEM per core
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    return out.reshape(B, NC * rows, D)[:, : T * Aq].reshape(B, T, Aq, D)


def _bwd_call(cfg: FusedCfg, q, u, mask_f, keep, ws, g):
    B, T, Aq, D = q.shape
    Ak, H = cfg.Ak, cfg.H
    rows = _pick_rows(T * Aq, cfg.rows_bwd)
    NC, P, qt, ut, mt, kt = _row_tiles(cfg, q, u, mask_f, keep, rows)
    gt = _pad_rows(g.reshape(B, T * Aq, D), T * Aq, NC * rows).reshape(
        B, NC, rows, D
    )

    args = [qt, ut, mt] + ([kt] if kt is not None else []) + list(ws) + [gt]
    in_specs, blk, w_spec = _specs(rows, P, Ak, D, H, ws, kt is not None)
    in_specs.append(blk(rows, D))  # g

    out_shapes = (
        jax.ShapeDtypeStruct((B, NC, rows, D), jnp.float32),   # dq
    ) + tuple(jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws)
    out_specs = (blk(rows, D),) + tuple(w_spec(w) for w in ws)

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, has_keep=kt is not None),
        grid=(B, NC),
        out_shape=out_shapes,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=cfg.interpret,
        compiler_params=None if cfg.interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*args)
    R_tot = T * Aq
    dq = outs[0].reshape(B, NC * rows, D)[:, :R_tot].reshape(B, T, Aq, D)
    dws = tuple(d.astype(w.dtype) for d, w in zip(outs[1:], ws))
    return dq, dws


# ---------------------------------------------------------------------------
# custom-VJP op
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_pair_attention(cfg: FusedCfg, q, u, mask_f, keep, ws):
    """Pre-gating AA aggregate with a fused backward.

    q      [B, T, Aq, D] f32 — projected queries (lin_q of the normed center)
    u      [B, T, Aq, Ak, 4] f32 — rotated pair features (sender feats + edge)
    mask_f [B, T, Aq, Ak] f32 — 0/1 adjacency
    keep   [B, T, Aq, Ak, H] or None — 0/1 attention-dropout keep mask
    ws     tuple of packed weights in ``W_ORDER``

    Returns [B, T, Aq, D] f32.
    """
    return _fwd_call(cfg, q, u, mask_f, keep, ws)


def _fused_fwd(cfg, q, u, mask_f, keep, ws):
    out = _fwd_call(cfg, q, u, mask_f, keep, ws)
    return out, (q, u, mask_f, keep, ws)


def _fused_bwd(cfg, res, g):
    q, u, mask_f, keep, ws = res
    dq, dws = _bwd_call(cfg, q, u, mask_f, keep, ws, g)
    dkeep = None if keep is None else jnp.zeros_like(keep)
    # u is scene-data-only (see _bwd_kernel): a zero cotangent is exact for
    # every training path; XLA DCEs the zeros
    return dq, jnp.zeros_like(u), jnp.zeros_like(mask_f), dkeep, dws


fused_pair_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# convenience wrapper used by the encoder
# ---------------------------------------------------------------------------
def build_pair_features(x_k, edge_vec, rot):
    """Rotated pair features u [B, T, Aq, Ak, 4] from the dense encoder
    inputs (elementwise; XLA fuses this into the surrounding graph).

    x_k [B, T, Ak, 2] · edge_vec [B, T, Aq, Ak, 2] · rot [B, Aq, 2, 2].
    """
    r = rot.reshape(rot.shape[0], 1, rot.shape[1], 1, 4)  # [B, 1, Aq, 1, 4]
    xk = x_k[:, :, None, :, :]                            # [B, T, 1, Ak, 2]
    xl0 = r[..., 0] * xk[..., 0] + r[..., 2] * xk[..., 1]
    xl1 = r[..., 1] * xk[..., 0] + r[..., 3] * xk[..., 1]
    el0 = r[..., 0] * edge_vec[..., 0] + r[..., 2] * edge_vec[..., 1]
    el1 = r[..., 1] * edge_vec[..., 0] + r[..., 3] * edge_vec[..., 1]
    return jnp.stack([xl0, xl1, el0, el1], axis=-1)


def fused_aa_aggregate(
    q: jax.Array,          # [B, T, Aq, D]
    x_k: jax.Array,        # [B, T, Ak, 2]
    edge_vec: jax.Array,   # [B, T, Aq, Ak, 2]
    rot: jax.Array,        # [B, Aq, 2, 2]
    mask: jax.Array,       # [B, T, Aq, Ak] bool
    packed: dict,
    num_heads: int,
    keep: jax.Array = None,
    dropout_rate: float = 0.0,
    rows_fwd: int = 64,
    rows_bwd: int = 24,
    compute_dtype: str = "float32",
    interpret: bool = False,
    ln_mm: bool = False,
) -> jax.Array:
    """Full fused AA propagate stage behind a simple signature."""
    B, T, Aq, D = q.shape
    Ak = x_k.shape[2]
    cfg = FusedCfg(
        Aq=Aq, Ak=Ak, D=D, H=num_heads, rows_fwd=rows_fwd, rows_bwd=rows_bwd,
        dropout_rate=float(dropout_rate), dtype=compute_dtype,
        interpret=interpret, ln_mm=ln_mm,
    )
    u = build_pair_features(
        x_k.astype(jnp.float32), edge_vec.astype(jnp.float32), rot.astype(jnp.float32)
    )
    ws = tuple(packed[k].astype(jnp.float32) for k in W_ORDER)
    keep_f = None if keep is None else keep.astype(jnp.float32)
    return fused_pair_attention(
        cfg, q.astype(jnp.float32), u, mask.astype(jnp.float32), keep_f, ws
    )


def reference_pair_attention(q, u, mask_f, keep, ws, *, Ak, H, dropout_rate, dtype="float32"):
    """Pure-jnp oracle with identical math (flattens batch into one tile)."""
    B, T, Aq, D = q.shape
    out = pair_chain(
        q.reshape(B * T * Aq, D),
        u.reshape(B * T * Aq * Ak, 4),
        mask_f.reshape(B * T * Aq, Ak),
        None if keep is None else keep.reshape(B * T * Aq * Ak, H),
        ws, Ak=Ak, H=H, dropout_rate=dropout_rate, dtype=dtype,
    )
    return out.reshape(B, T, Aq, D)
