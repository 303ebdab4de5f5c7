"""Fused agent-agent attention kernel (the training/serving FLOP hot spot).

The AA block evaluates a 3-layer MLP on EVERY (receiver, sender) pair —
inputs are only 4 numbers per pair (sender features and edge vector, both
rotated into the receiver frame: ``enc_hivt_nusargo_grid.py:178-186``) but
the XLA path materializes several ``[B·T·Aq·Ak, 64]`` tensors in HBM.
This kernel runs the whole chain per (scene, step) tile in VMEM:

* pairwise rotated features built as rank-1 outer products (VPU);
* the two embedding branches PACKED side-by-side into 128-lane tensors so
  every matmul runs the full MXU width (``[P,4]×[4,128]``,
  ``[P,128]×[128,128]`` block-diagonal second layer);
* per-half LayerNorms via lane-slicing; k/v in one ``[64,128]`` matmul;
* per-head logits via a one-hot head-selector matmul, masked softmax over
  senders, head-expanded weighted sum.

Scope = the reference ``propagate`` (message+aggregate) stage: everything
from the normed center embeddings to the pre-gating aggregate.  The
per-node stages around it (center embed, gating, out_proj, FFN) are
node-wise and stay on XLA.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _ln(x, scale, bias, eps=1e-5):
    """LayerNorm with f32 statistics regardless of input dtype."""
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.mean((x32 - m) * (x32 - m), axis=-1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps) * scale + bias).astype(x.dtype)


def _ln_halves(h, scale, bias, D, eps=1e-5):
    """LayerNorm applied independently to lanes [0:D] and [D:2D]."""
    h0 = _ln(h[:, :D], scale[:, :D], bias[:, :D], eps)
    h1 = _ln(h[:, D:], scale[:, D:], bias[:, D:], eps)
    return jnp.concatenate([h0, h1], axis=-1)


def _aa_kernel(
    u_ref, center_ref, mask_ref,
    wu_ref, bu_ref, ln0s_ref, ln0b_ref, w1_ref, b1_ref,
    lna0s_ref, lna0b_ref, wagg_ref, bagg_ref, lna1s_ref, lna1b_ref,
    wq_ref, bq_ref, wkv_ref, bkv_ref, hsel_ref, hexp_ref,
    out_ref,
    *, rows: int, Ak: int, D: int, H: int, dtype,
):
    """One (scene, step-chunk) tile: a pure fused chain on ``rows`` pairs.

    ``u`` (the 4 rotated pair features) is precomputed by XLA — it is tiny
    (4 lanes) and elementwise — so the kernel is matmul-dense end to end:
    ``[rows·Ak, 4]×[4, 2D]`` → blocked ``[2D, 2D]`` → ``[D, 2D]`` k/v, with
    the masked per-head softmax and aggregation on chip.
    """
    scale = 1.0 / np.sqrt(D // H)
    P = rows * Ak

    u = u_ref[0, 0].astype(dtype)          # [P, 4]
    center = center_ref[0, 0].astype(dtype)  # [rows, D]
    mask = mask_ref[0, 0]                  # [rows, Ak] float 0/1

    h = (jnp.dot(u, wu_ref[:], preferred_element_type=jnp.float32) + bu_ref[0, :]).astype(dtype)
    h = jax.nn.relu(_ln_halves(h, ln0s_ref[:], ln0b_ref[:], D))
    h = (jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0, :]).astype(dtype)
    s = h[:, :D] + h[:, D:]
    s = jax.nn.relu(_ln(s, lna0s_ref[0, :], lna0b_ref[0, :]))
    nbr = (jnp.dot(s, wagg_ref[:], preferred_element_type=jnp.float32) + bagg_ref[0, :]).astype(dtype)
    nbr = _ln(nbr, lna1s_ref[0, :], lna1b_ref[0, :])

    kv = jnp.dot(nbr, wkv_ref[:], preferred_element_type=jnp.float32) + bkv_ref[0, :]
    q = jnp.dot(center, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[0, :]

    k3 = kv[:, :D].reshape(rows, Ak, D)
    v3 = kv[:, D:].reshape(rows, Ak, D)
    qk = k3 * q[:, None, :]
    logits = jax.lax.dot_general(
        qk, hsel_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                    # [rows, Ak, H]
    logits = jnp.where(mask[:, :, None] > 0, logits, NEG)
    m = jnp.max(logits, axis=1, keepdims=True)
    e = jnp.exp(logits - m) * mask[:, :, None]
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
    alpha = e / denom
    att = jax.lax.dot_general(
        alpha, hexp_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # [rows, Ak, D]
    out_ref[0, 0] = jnp.sum(att * v3, axis=1)    # [rows, D]


def build_pair_features(x_k, pos_q, pos_k, rot):
    """Rotated pair features ``u [B, T, Aq, Ak, 4]`` (XLA, elementwise)."""
    xk0 = x_k[..., 0][:, :, None, :]
    xk1 = x_k[..., 1][:, :, None, :]
    r = rot
    xl0 = r[:, None, :, 0:1] * xk0 + r[:, None, :, 2:3] * xk1
    xl1 = r[:, None, :, 1:2] * xk0 + r[:, None, :, 3:4] * xk1
    e0 = pos_k[..., 0][:, :, None, :] - pos_q[..., 0][:, :, :, None]
    e1 = pos_k[..., 1][:, :, None, :] - pos_q[..., 1][:, :, :, None]
    el0 = r[:, None, :, 0:1] * e0 + r[:, None, :, 2:3] * e1
    el1 = r[:, None, :, 1:2] * e0 + r[:, None, :, 3:4] * e1
    return jnp.stack([xl0, xl1, el0, el1], axis=-1)


def pack_aa_params(aa_params: Dict) -> Dict[str, jax.Array]:
    """Pack linen AAEncoder params into the kernel's fused weight layout.

    Branch packing: ``wu [4, 2D]`` holds the two ``Dense(2→D)`` first
    layers block-diagonally (rows 0-1 → lanes [0:D] for the sender-feature
    branch, rows 2-3 → lanes [D:2D] for the edge branch); ``w1 [2D, 2D]``
    is the block-diagonal pair of ``Dense(D→D)`` second layers.
    """
    nbr = aa_params["nbr_embed"]
    attn = aa_params["attn"]
    D = nbr["in0_dense0"]["kernel"].shape[1]

    wu = jnp.zeros((4, 2 * D))
    wu = wu.at[0:2, :D].set(nbr["in0_dense0"]["kernel"])
    wu = wu.at[2:4, D:].set(nbr["in1_dense0"]["kernel"])
    bu = jnp.concatenate([nbr["in0_dense0"]["bias"], nbr["in1_dense0"]["bias"]])[None]

    ln0s = jnp.concatenate([nbr["in0_ln0"]["scale"], nbr["in1_ln0"]["scale"]])[None]
    ln0b = jnp.concatenate([nbr["in0_ln0"]["bias"], nbr["in1_ln0"]["bias"]])[None]

    w1 = jnp.zeros((2 * D, 2 * D))
    w1 = w1.at[:D, :D].set(nbr["in0_dense1"]["kernel"])
    w1 = w1.at[D:, D:].set(nbr["in1_dense1"]["kernel"])
    b1 = jnp.concatenate([nbr["in0_dense1"]["bias"], nbr["in1_dense1"]["bias"]])[None]

    wkv = jnp.concatenate([attn["lin_k"]["kernel"], attn["lin_v"]["kernel"]], axis=1)
    bkv = jnp.concatenate([attn["lin_k"]["bias"], attn["lin_v"]["bias"]])[None]

    return dict(
        wu=wu, bu=bu, ln0s=ln0s, ln0b=ln0b, w1=w1, b1=b1,
        lna0s=nbr["aggr_ln0"]["scale"][None], lna0b=nbr["aggr_ln0"]["bias"][None],
        wagg=nbr["aggr_dense"]["kernel"], bagg=nbr["aggr_dense"]["bias"][None],
        lna1s=nbr["aggr_ln1"]["scale"][None], lna1b=nbr["aggr_ln1"]["bias"][None],
        wq=attn["lin_q"]["kernel"], bq=attn["lin_q"]["bias"][None],
        wkv=wkv, bkv=bkv,
    )


def aa_attention_reference(center_norm, x_k, pos_q, pos_k, rot, mask, packed, H):
    """Pure-jnp reference with the identical packed-weight math (test oracle
    and the recompute path for gradients)."""
    D = center_norm.shape[-1]
    B, T, Aq, _ = center_norm.shape
    Ak = x_k.shape[2]

    r = rot  # [B, Aq, 4]
    xk0 = x_k[..., 0][:, :, None, :]
    xk1 = x_k[..., 1][:, :, None, :]
    xl0 = r[:, None, :, 0:1] * xk0 + r[:, None, :, 2:3] * xk1
    xl1 = r[:, None, :, 1:2] * xk0 + r[:, None, :, 3:4] * xk1
    e0 = pos_k[..., 0][:, :, None, :] - pos_q[..., 0][:, :, :, None]
    e1 = pos_k[..., 1][:, :, None, :] - pos_q[..., 1][:, :, :, None]
    el0 = r[:, None, :, 0:1] * e0 + r[:, None, :, 2:3] * e1
    el1 = r[:, None, :, 1:2] * e0 + r[:, None, :, 3:4] * e1
    u = jnp.stack([xl0, xl1, el0, el1], axis=-1)  # [B, T, Aq, Ak, 4]

    h = u @ packed["wu"] + packed["bu"][0]
    h0 = _ln(h[..., :D], packed["ln0s"][0, :D], packed["ln0b"][0, :D])
    h1 = _ln(h[..., D:], packed["ln0s"][0, D:], packed["ln0b"][0, D:])
    h = jax.nn.relu(jnp.concatenate([h0, h1], -1))
    h = h @ packed["w1"] + packed["b1"][0]
    s = jax.nn.relu(_ln(h[..., :D] + h[..., D:], packed["lna0s"][0], packed["lna0b"][0]))
    nbr = _ln(s @ packed["wagg"] + packed["bagg"][0], packed["lna1s"][0], packed["lna1b"][0])

    kv = nbr @ packed["wkv"] + packed["bkv"][0]
    q = center_norm @ packed["wq"] + packed["bq"][0]
    head = D // H
    k = kv[..., :D].reshape(B, T, Aq, Ak, H, head)
    v = kv[..., D:].reshape(B, T, Aq, Ak, H, head)
    logits = jnp.einsum("btqhd,btqkhd->btqkh", q.reshape(B, T, Aq, H, head), k)
    logits = logits / np.sqrt(head)
    logits = jnp.where(mask[..., None], logits, NEG)
    m = jnp.max(logits, axis=3, keepdims=True)
    e = jnp.exp(logits - m) * mask[..., None]
    alpha = e / jnp.maximum(e.sum(axis=3, keepdims=True), 1e-16)
    agg = jnp.einsum("btqkh,btqkhd->btqhd", alpha, v)
    return agg.reshape(B, T, Aq, D)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret", "t_chunk", "compute_dtype")
)
def aa_attention(
    center_norm: jax.Array,  # [B, T, Aq, D] — norm1(center embeddings)
    x_k: jax.Array,          # [B, T, Ak, 2] sender displacement features
    pos_q: jax.Array,        # [B, T, Aq, 2] receiver positions per step
    pos_k: jax.Array,        # [B, T, Ak, 2] sender positions per step
    rot: jax.Array,          # [B, Aq, 4] receiver rotation (row-major 2x2)
    mask: jax.Array,         # [B, T, Aq, Ak] bool adjacency
    packed: Dict[str, jax.Array],
    num_heads: int,
    interpret: bool = False,
    t_chunk: int = 3,
    compute_dtype: str = "float32",
) -> jax.Array:
    """Fused pre-gating AA aggregate: returns [B, T, Aq, D].

    Grid = (B, T/t_chunk); each iteration runs ``t_chunk·Aq·Ak`` pairs
    through the packed chain as one set of MXU-shaped matmuls.
    """
    B, T, Aq, D = center_norm.shape
    Ak = x_k.shape[2]
    while T % t_chunk:
        t_chunk -= 1
    TC = T // t_chunk
    rows = t_chunk * Aq
    P = rows * Ak

    # [B, TC, ...] layout: per-(scene, chunk) blocks equal the full trailing
    # dims, satisfying Mosaic's (8, 128)-or-full block constraint
    u = build_pair_features(
        x_k.astype(jnp.float32), pos_q.astype(jnp.float32),
        pos_k.astype(jnp.float32), rot.astype(jnp.float32),
    ).reshape(B, TC, P, 4)
    center = center_norm.astype(jnp.float32).reshape(B, TC, rows, D)
    mask_f = mask.astype(jnp.float32).reshape(B, TC, rows, Ak)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda b, t: (0,) * arr.ndim, memory_space=pltpu.VMEM)

    order = [
        "wu", "bu", "ln0s", "ln0b", "w1", "b1",
        "lna0s", "lna0b", "wagg", "bagg", "lna1s", "lna1b",
        "wq", "bq", "wkv", "bkv",
    ]
    cdt = jnp.dtype(compute_dtype)
    weights = [packed[k].astype(cdt) for k in order]
    head = D // num_heads
    hsel = jnp.repeat(jnp.eye(num_heads, dtype=jnp.float32), head, axis=0)  # [D, H]
    hexp = hsel.T                                                           # [H, D]

    in_specs = [
        pl.BlockSpec((1, 1, P, 4), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rows, D), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rows, Ak), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        *[w_spec(w) for w in weights],
        w_spec(hsel),
        w_spec(hexp),
    ]

    kernel = functools.partial(
        _aa_kernel, rows=rows, Ak=Ak, D=D, H=num_heads, dtype=cdt
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, TC),
        out_shape=jax.ShapeDtypeStruct((B, TC, rows, D), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rows, D), lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(u, center, mask_f, *weights, hsel, hexp)
    return out.reshape(B, T, Aq, D).astype(center_norm.dtype)
