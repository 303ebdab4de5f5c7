"""Fused AA-attention kernel vs the linen XLA path (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from trajsde_tpu.data.synthetic import make_scene_batch
from trajsde_tpu.models import graph
from trajsde_tpu.models.embedding import MultipleInputEmbedding
from trajsde_tpu.models.layers import EdgeAttention
from trajsde_tpu.ops.pallas.aa_attention import (
    aa_attention,
    aa_attention_reference,
    pack_aa_params,
)

B, T, Aq, Ak, D, H = 2, 5, 9, 8, 64, 8


def _inputs(rng):
    center = rng.normal(size=(B, T, Aq, D)).astype(np.float32)
    x_k = rng.normal(size=(B, T, Ak, 2)).astype(np.float32)
    pos_q = rng.normal(scale=20, size=(B, T, Aq, 2)).astype(np.float32)
    pos_k = np.concatenate([pos_q[:, :, :Ak], np.zeros((B, T, 0, 2), np.float32)], 2)
    pos_k = pos_k + rng.normal(scale=5, size=pos_k.shape).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, size=(B, Aq)).astype(np.float32)
    c, s = np.cos(ang), np.sin(ang)
    rot = np.stack([c, -s, s, c], axis=-1)  # row-major [[c,-s],[s,c]]
    mask = rng.uniform(size=(B, T, Aq, Ak)) > 0.4
    mask[0, 0, 0] = False  # an all-masked receiver row
    return center, x_k, pos_q, pos_k, rot, mask


def _linen_params(rng):
    """Init the real linen modules and extract an AA param subtree."""
    mie = MultipleInputEmbedding(D)
    attn = EdgeAttention(D, H, dropout=0.0)
    p_mie = mie.init(jax.random.key(3), [jnp.ones((1, 2)), jnp.ones((1, 2))])
    p_attn = attn.init(
        jax.random.key(4), jnp.ones((1, D)), jnp.ones((1, 1), bool),
        kv_pair=jnp.ones((1, 1, D)),
    )
    return {"nbr_embed": p_mie["params"], "attn": p_attn["params"]}, mie, attn


def test_reference_matches_linen_path(rng):
    """The packed-weight jnp reference == the real linen module chain."""
    center, x_k, pos_q, pos_k, rot, mask = _inputs(rng)
    aa_params, mie, attn = _linen_params(rng)
    packed = pack_aa_params(aa_params)

    got = aa_attention_reference(
        jnp.asarray(center), jnp.asarray(x_k), jnp.asarray(pos_q),
        jnp.asarray(pos_k), jnp.asarray(rot), jnp.asarray(mask), packed, H,
    )

    # linen path: rotate pairwise, embed, attend (the AAEncoder inner block)
    r2 = np.asarray(rot).reshape(B, Aq, 2, 2)
    xk_loc = np.einsum("btkj,bqji->btqki", x_k, r2)
    edge = pos_k[:, :, None, :, :] - pos_q[:, :, :, None, :]
    edge_loc = np.einsum("btqkj,bqji->btqki", edge, r2)
    nbr = mie.apply(
        {"params": aa_params["nbr_embed"]},
        [jnp.asarray(xk_loc), jnp.asarray(edge_loc)],
    )
    # EdgeAttention up to the aggregate: replicate its pre-gating part by
    # running the module with a zero self path: gate*(lin_self(center)-agg)
    # is excluded from the kernel scope, so compare against a manual attn
    Wq = aa_params["attn"]["lin_q"]["kernel"]; bq = aa_params["attn"]["lin_q"]["bias"]
    Wk = aa_params["attn"]["lin_k"]["kernel"]; bk = aa_params["attn"]["lin_k"]["bias"]
    Wv = aa_params["attn"]["lin_v"]["kernel"]; bv = aa_params["attn"]["lin_v"]["bias"]
    q = (center @ np.asarray(Wq) + np.asarray(bq)).reshape(B, T, Aq, H, D // H)
    k = (np.asarray(nbr) @ np.asarray(Wk) + np.asarray(bk)).reshape(B, T, Aq, Ak, H, D // H)
    v = (np.asarray(nbr) @ np.asarray(Wv) + np.asarray(bv)).reshape(B, T, Aq, Ak, H, D // H)
    logits = np.einsum("btqhd,btqkhd->btqkh", q, k) / np.sqrt(D // H)
    logits = np.where(mask[..., None], logits, -1e9)
    e = np.exp(logits - logits.max(3, keepdims=True)) * mask[..., None]
    alpha = e / np.maximum(e.sum(3, keepdims=True), 1e-16)
    want = np.einsum("btqkh,btqkhd->btqhd", alpha, v).reshape(B, T, Aq, D)

    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_kernel_matches_reference(rng):
    center, x_k, pos_q, pos_k, rot, mask = _inputs(rng)
    aa_params, _, _ = _linen_params(rng)
    packed = pack_aa_params(aa_params)
    args = (
        jnp.asarray(center), jnp.asarray(x_k), jnp.asarray(pos_q),
        jnp.asarray(pos_k), jnp.asarray(rot), jnp.asarray(mask),
    )
    want = np.asarray(aa_attention_reference(*args, packed, H))
    got = np.asarray(aa_attention(*args, packed, num_heads=H, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    # all-masked receiver row aggregates to exactly 0
    np.testing.assert_allclose(got[0, 0, 0], 0.0, atol=1e-6)
