"""Dense masked attention vs a numpy scatter oracle of the PyG semantics.

The reference computes attention as scatter-softmax over ragged incoming
edge lists (``enc_hivt_nusargo_grid.py:169-201``); the dense rebuild must
reproduce it exactly for every mask pattern, including nodes with zero
incoming edges (gated self path).
"""
import jax
import jax.numpy as jnp
import numpy as np

from trajsde_tpu.models.layers import EdgeAttention

D, H, NQ, NK = 64, 8, 7, 6


def _dense(p, name):
    return p["params"][name]["kernel"], p["params"][name]["bias"]


def _scatter_oracle(params, center, kv_pair, mask):
    """Edge-list implementation of EdgeAttention (PyG message/update path)."""
    Wq, bq = _dense(params, "lin_q")
    Wk, bk = _dense(params, "lin_k")
    Wv, bv = _dense(params, "lin_v")
    Wih, bih = _dense(params, "lin_ih")
    Whh, bhh = _dense(params, "lin_hh")
    Ws, bs = _dense(params, "lin_self")
    Wo, bo = _dense(params, "out_proj")
    head = D // H

    out = np.zeros((NQ, D), np.float32)
    for i in range(NQ):
        q = (center[i] @ Wq + bq).reshape(H, head)
        nbrs = np.nonzero(mask[i])[0]
        agg = np.zeros(D, np.float32)
        if nbrs.size:
            ks = (kv_pair[i, nbrs] @ Wk + bk).reshape(-1, H, head)
            vs = (kv_pair[i, nbrs] @ Wv + bv).reshape(-1, H, head)
            logits = (q[None] * ks).sum(-1) / np.sqrt(head)  # [n, H]
            e = np.exp(logits - logits.max(0, keepdims=True))
            alpha = e / e.sum(0, keepdims=True)
            agg = (alpha[..., None] * vs).sum(0).reshape(D)
        gate = 1.0 / (1.0 + np.exp(-(agg @ Wih + bih + center[i] @ Whh + bhh)))
        upd = agg + gate * (center[i] @ Ws + bs - agg)
        out[i] = upd @ Wo + bo
    return out


def test_edge_attention_matches_scatter_oracle(rng):
    center = rng.normal(size=(NQ, D)).astype(np.float32)
    kv = rng.normal(size=(NQ, NK, D)).astype(np.float32)
    mask = rng.uniform(size=(NQ, NK)) > 0.5
    mask[0] = False  # a node with zero incoming edges

    mod = EdgeAttention(D, H, dropout=0.0)
    params = mod.init(
        jax.random.key(0), jnp.asarray(center), jnp.asarray(mask), kv_pair=jnp.asarray(kv)
    )
    got = np.asarray(
        mod.apply(params, jnp.asarray(center), jnp.asarray(mask), kv_pair=jnp.asarray(kv))
    )
    want = _scatter_oracle(
        jax.tree.map(np.asarray, params), center, kv, mask
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
