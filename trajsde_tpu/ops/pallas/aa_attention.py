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
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.mean((x - m) * (x - m), axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _ln_halves(h, scale, bias, D, eps=1e-5):
    """LayerNorm applied independently to lanes [0:D] and [D:2D]."""
    h0 = _ln(h[:, :D], scale[:, :D], bias[:, :D], eps)
    h1 = _ln(h[:, D:], scale[:, D:], bias[:, D:], eps)
    return jnp.concatenate([h0, h1], axis=-1)


def _aa_kernel(
    center_ref, xk_ref, posq_ref, posk_ref, rot_ref, mask_ref,
    wu_ref, bu_ref, ln0s_ref, ln0b_ref, w1_ref, b1_ref,
    lna0s_ref, lna0b_ref, wagg_ref, bagg_ref, lna1s_ref, lna1b_ref,
    wq_ref, bq_ref, wkv_ref, bkv_ref, hsel_ref, hexp_ref,
    out_ref,
    *, T: int, Aq: int, Ak: int, D: int, H: int,
):
    """Per-scene tile: batch blocks are (1, T, ...); weights full blocks."""
    scale = 1.0 / np.sqrt(D // H)
    r = rot_ref[0]                  # [Aq, 4] = [R00, R01, R10, R11]

    def body(t, _):
        xk = xk_ref[0, t]           # [Ak, 2]
        pq = posq_ref[0, t]         # [Aq, 2]
        pk = posk_ref[0, t]         # [Ak, 2]
        center = center_ref[0, t]   # [Aq, D]
        mask = mask_ref[0, t]       # [Aq, Ak] float 0/1

        # rotated pairwise features as rank-1 outer products
        xk0 = xk[:, 0][None, :]
        xk1 = xk[:, 1][None, :]
        xl0 = r[:, 0:1] * xk0 + r[:, 2:3] * xk1
        xl1 = r[:, 1:2] * xk0 + r[:, 3:4] * xk1
        e0 = pk[:, 0][None, :] - pq[:, 0:1]
        e1 = pk[:, 1][None, :] - pq[:, 1:2]
        el0 = r[:, 0:1] * e0 + r[:, 2:3] * e1
        el1 = r[:, 1:2] * e0 + r[:, 3:4] * e1

        u = jnp.stack([xl0, xl1, el0, el1], axis=-1).reshape(Aq * Ak, 4)

        # two-branch embed chain on 2D lanes
        h = jnp.dot(u, wu_ref[:], preferred_element_type=jnp.float32) + bu_ref[0, :]
        h = jax.nn.relu(_ln_halves(h, ln0s_ref[:], ln0b_ref[:], D))
        h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[0, :]
        s = h[:, :D] + h[:, D:]
        s = jax.nn.relu(_ln(s, lna0s_ref[0, :], lna0b_ref[0, :]))
        nbr = jnp.dot(s, wagg_ref[:], preferred_element_type=jnp.float32) + bagg_ref[0, :]
        nbr = _ln(nbr, lna1s_ref[0, :], lna1b_ref[0, :])

        kv = jnp.dot(nbr, wkv_ref[:], preferred_element_type=jnp.float32) + bkv_ref[0, :]
        q = jnp.dot(center, wq_ref[:], preferred_element_type=jnp.float32) + bq_ref[0, :]

        k3 = kv[:, :D].reshape(Aq, Ak, D)
        v3 = kv[:, D:].reshape(Aq, Ak, D)
        qk = k3 * q[:, None, :]
        # per-head sums via one-hot selector: [Aq, Ak, H]
        logits = jax.lax.dot_general(
            qk, hsel_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        logits = jnp.where(mask[:, :, None] > 0, logits, NEG)
        m = jnp.max(logits, axis=1, keepdims=True)
        e = jnp.exp(logits - m) * mask[:, :, None]
        denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
        alpha = e / denom
        # expand heads back to lanes and aggregate over senders
        att = jax.lax.dot_general(
            alpha, hexp_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                        # [Aq, Ak, D]
        agg = jnp.sum(att * v3, axis=1)          # [Aq, D]
        out_ref[0, t] = agg
        return 0

    jax.lax.fori_loop(0, T, body, 0)


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


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
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
) -> jax.Array:
    """Fused pre-gating AA aggregate: returns [B, T, Aq, D]."""
    B, T, Aq, D = center_norm.shape
    Ak = x_k.shape[2]

    def spec(arr, block=None, index=None):
        if block is None:
            return pl.BlockSpec(arr.shape, lambda b: (0,) * arr.ndim, memory_space=pltpu.VMEM)
        return pl.BlockSpec(block, index, memory_space=pltpu.VMEM)

    f32 = lambda a: a.astype(jnp.float32)
    inputs = [
        f32(center_norm), f32(x_k), f32(pos_q), f32(pos_k), f32(rot),
        mask.astype(jnp.float32),
    ]
    in_specs = [
        spec(None, (1, T, Aq, D), lambda b: (b, 0, 0, 0)),
        spec(None, (1, T, Ak, 2), lambda b: (b, 0, 0, 0)),
        spec(None, (1, T, Aq, 2), lambda b: (b, 0, 0, 0)),
        spec(None, (1, T, Ak, 2), lambda b: (b, 0, 0, 0)),
        spec(None, (1, Aq, 4), lambda b: (b, 0, 0)),
        spec(None, (1, T, Aq, Ak), lambda b: (b, 0, 0, 0)),
    ]
    order = [
        "wu", "bu", "ln0s", "ln0b", "w1", "b1",
        "lna0s", "lna0b", "wagg", "bagg", "lna1s", "lna1b",
        "wq", "bq", "wkv", "bkv",
    ]
    weights = [f32(packed[k]) for k in order]
    in_specs += [spec(w) for w in weights]
    head = D // num_heads
    hsel = jnp.repeat(jnp.eye(num_heads, dtype=jnp.float32), head, axis=0)  # [D, H]
    hexp = hsel.T                                                           # [H, D]
    in_specs += [spec(hsel), spec(hexp)]

    kernel = functools.partial(
        _aa_kernel, T=T, Aq=Aq, Ak=Ak, D=D, H=num_heads
    )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, T, Aq, D), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, Aq, D), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs, *weights, hsel, hexp)
    return out.astype(center_norm.dtype)
