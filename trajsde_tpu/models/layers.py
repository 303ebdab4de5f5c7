"""Shared attention / gating primitives for the dense HiVT-style blocks.

The reference expresses attention as PyG ``MessagePassing`` with
scatter-softmax over ragged incoming-edge sets.  Here the same math runs
over fixed-shape dense adjacencies with boolean masks:

* ``masked_softmax`` reproduces PyG ``softmax(alpha, index)`` semantics,
  including the all-masked case (a node with zero incoming edges
  aggregates to exactly 0, so the gated update reduces to the pure
  self path — matching ``enc_hivt_nusargo_grid.py:196-201``).
* ``EdgeAttention`` is the common pattern of AAEncoder / ALEncoder /
  GlobalInteractorLayer: per-edge keys+values, per-head dot-product
  logits, softmax over senders, sum-aggregate, GRU-style gated update
  with the (normed) receiver embedding, output projection.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

XAVIER = nn.initializers.xavier_uniform()
LN_EPS = 1e-5


def masked_softmax(logits: jax.Array, mask: jax.Array, axis: int = -1) -> jax.Array:
    """Softmax over ``axis`` restricted to ``mask``; all-masked rows → 0."""
    big_neg = jnp.finfo(logits.dtype).min
    masked_logits = jnp.where(mask, logits, big_neg)
    m = jnp.max(masked_logits, axis=axis, keepdims=True)
    e = jnp.exp(masked_logits - m) * mask.astype(logits.dtype)
    s = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(s, jnp.asarray(1e-16, logits.dtype))


class ParamDense(nn.Module):
    """Declares a Dense layer's params without applying it.

    Used by the packed compute paths: the parameter tree stays IDENTICAL
    to the per-layer ``nn.Dense`` version (same scope names, same
    initializers — flax derives each param's init RNG from its scope
    path, so even the initial values coincide), while the matmuls are
    evaluated horizontally packed for MXU width.
    """

    in_features: int
    features: int
    kernel_init: Any = XAVIER

    @nn.compact
    def __call__(self):
        return {
            "kernel": self.param(
                "kernel", self.kernel_init, (self.in_features, self.features)
            ),
            "bias": self.param("bias", nn.initializers.zeros, (self.features,)),
        }


def packed_mlp_eval(nets, x, dtype=None, act=jnp.tanh):
    """Evaluate K equal-depth MLPs sharing the input ``x`` as ONE chain.

    ``nets``: list of ordered ``[{kernel, bias}, ...]`` per net.  Layer 0
    kernels are hstacked (shared input), deeper layers form a block
    diagonal; the zero blocks contribute exact zeros, so the math is the
    per-net math — but each D=64-wide matmul pair/triple now fills a full
    128/192-wide MXU tile instead of padding half of it (the per-step SDE
    MLPs are the dominant sequential cost; see PERF.md "matmul packing").
    ``act`` is applied before every layer after the first (the
    FFunc/GFunc tanh chain).  Returns the per-net output splits.
    """
    depth = len(nets[0])
    assert all(len(n) == depth for n in nets)
    h = x if dtype is None else x.astype(dtype)  # nn.Dense promote_dtype parity
    for li in range(depth):
        ks = [n[li]["kernel"] for n in nets]
        if li == 0:
            w = jnp.concatenate(ks, axis=1)
        else:
            w = jax.scipy.linalg.block_diag(*ks)
        b = jnp.concatenate([n[li]["bias"] for n in nets], axis=0)
        if dtype is not None:
            w = w.astype(dtype)
            b = b.astype(dtype)
        if li > 0:
            h = act(h)
        h = h @ w + b
    widths = [n[-1]["kernel"].shape[1] for n in nets]
    splits = []
    start = 0
    for wd in widths:
        splits.append(h[..., start : start + wd])
        start += wd
    return splits


class MlpBlock(nn.Module):
    """Feed-forward block Dense(4D) → ReLU → Drop → Dense(D) → Drop."""

    embed_dim: int
    dropout: float = 0.1
    dtype: Any = None  # compute dtype (params stay f32); None = float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        h = nn.Dense(self.embed_dim * 4, kernel_init=XAVIER, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.embed_dim, kernel_init=XAVIER, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h


class EdgeAttention(nn.Module):
    """Dense masked edge attention with HiVT's gated update.

    Inputs:
      center:    [..., Nq, D]   receiver embeddings (pre-normed by caller)
      mask:      [..., Nq, Nk] bool adjacency (True = edge exists)
      kv_pair:   [..., Nq, Nk, D] per-edge neighbor embeddings
                 (AAEncoder / ALEncoder pattern — keys depend on the
                 receiver's rotation frame, so they are intrinsically
                 per-pair: ``enc_hivt_nusargo_grid.py:178-189``)
      kv_node:   [..., Nk, D] per-node neighbor embeddings +
      kv_edge:   [..., Nq, Nk, D] per-edge stream, projected separately and
                 added (GlobalInteractorLayer: key = k_node + k_edge,
                 value = v_node + v_edge, ``agg_hivt.py:108-117``)

    Returns [..., Nq, D] — the post-gating, post-projection message block
    (the caller applies residual + FFN).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = None
    packed: bool = False  # hstack-packed q/hh/self and k/v projections —
                          # identical params + math, but MEASURED SLOWER at
                          # production shapes (86.1 vs 76.9 ms/step: the
                          # packed [.., 2D] pair-tensor intermediate costs
                          # more HBM traffic than the half-width matmuls
                          # save; see PERF.md).  Knob kept with parity test.

    @nn.compact
    def __call__(
        self,
        center: jax.Array,
        mask: jax.Array,
        kv_pair: Optional[jax.Array] = None,
        kv_node: Optional[jax.Array] = None,
        kv_edge: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        D, H = self.embed_dim, self.num_heads
        head_dim = D // H
        scale = head_dim ** 0.5

        if self.packed:
            # horizontal packing: lin_q/lin_hh/lin_self share ``center`` and
            # lin_k/lin_v share their kv stream — hstacked kernels run one
            # full-width matmul per stream instead of 2-3 half-width ones
            # (the k/v matmuls ride the model's LARGEST tensor, the AA pair
            # embeddings).  Param tree identical to the per-layer path.
            def bank(name):
                return ParamDense(D, D, name=name)()

            def packed_apply(x, banks):
                w = jnp.concatenate([b["kernel"] for b in banks], axis=1)
                bb = jnp.concatenate([b["bias"] for b in banks], axis=0)
                if self.dtype is not None:
                    x, w, bb = x.astype(self.dtype), w.astype(self.dtype), bb.astype(self.dtype)
                out = x @ w + bb
                return jnp.split(out, len(banks), axis=-1)

            q, hh_pre, self_pre = packed_apply(
                center, [bank("lin_q"), bank("lin_hh"), bank("lin_self")]
            )
            if kv_pair is not None:
                k, v = packed_apply(kv_pair, [bank("lin_k"), bank("lin_v")])
            else:
                kn, vn = packed_apply(kv_node, [bank("lin_k"), bank("lin_v")])
                ke, ve = packed_apply(
                    kv_edge, [bank("lin_k_edge"), bank("lin_v_edge")]
                )
                k = kn[..., None, :, :] + ke
                v = vn[..., None, :, :] + ve
        else:
            q = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_q")(center)
            hh_pre = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_hh")(center)
            self_pre = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_self")(center)
            if kv_pair is not None:
                k = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_k")(kv_pair)
                v = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_v")(kv_pair)
            else:
                # node-wise projections stay [..., Nk, D]; the per-edge stream is
                # projected separately and broadcast-added over the query axis.
                k = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_k")(kv_node)[..., None, :, :]
                v = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_v")(kv_node)[..., None, :, :]
                k = k + nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_k_edge")(kv_edge)
                v = v + nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_v_edge")(kv_edge)

        q = q.reshape(q.shape[:-1] + (H, head_dim))
        k = k.reshape(k.shape[:-1] + (H, head_dim))
        v = v.reshape(v.shape[:-1] + (H, head_dim))

        # [..., Nq, Nk, H]: per-edge per-head dot product
        alpha = jnp.einsum("...qhd,...qkhd->...qkh", q, k) / scale
        alpha = masked_softmax(alpha, mask[..., None], axis=-2)
        alpha = nn.Dropout(self.dropout)(alpha, deterministic=deterministic)

        agg = jnp.einsum("...qkh,...qkhd->...qhd", alpha, v)
        agg = agg.reshape(agg.shape[:-2] + (D,))

        gate = nn.sigmoid(
            nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="lin_ih")(agg)
            + hh_pre
        )
        out = agg + gate * (self_pre - agg)
        out = nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class MultiheadSelfAttention(nn.Module):
    """Plain MHA over a sequence axis with an additive mask.

    Equivalent of ``torch.nn.MultiheadAttention`` as used by the temporal
    transformer (``enc_hivt_nusargo_grid.py:264,286``).
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jax.Array, attn_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        D, H = self.embed_dim, self.num_heads
        head_dim = D // H
        qkv = nn.Dense(3 * D, kernel_init=XAVIER, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(q.shape[:-1] + (H, head_dim))
        k = k.reshape(k.shape[:-1] + (H, head_dim))
        v = v.reshape(v.shape[:-1] + (H, head_dim))
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k) / (head_dim ** 0.5)
        # additive mask [..., q, k]: insert the head axis HERE so a batched
        # mask can never misalign its batch dim against heads (a [B, q, k]
        # mask with B == num_heads would otherwise broadcast silently wrong)
        logits = logits + attn_mask[..., None, :, :]
        w = jax.nn.softmax(logits, axis=-1)
        w = nn.Dropout(self.dropout)(w, deterministic=deterministic)
        out = jnp.einsum("...hqk,...khd->...qhd", w, v)
        out = out.reshape(out.shape[:-2] + (D,))
        return nn.Dense(D, kernel_init=XAVIER, dtype=self.dtype, name="out_proj")(out)


class ReductionMLP(nn.Module):
    """Generic LN/ReLU/Dropout MLP with a dimension-reduction schedule.

    Capability analog of the reference's unused ``MLP`` utility
    (``models/utils/util.py:161-191``): hidden width
    ``max(output_dim, input_dim / reduction_factor^i)`` per layer.
    """

    input_dim: int
    output_dim: int
    num_layers: int = 2
    dropout_rate: float = 0.1
    reduction_factor: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # width schedule matches the reference exactly: the input layer and
        # the first hidden layer share max(out, in/f); hidden layer i
        # (0-based) is max(out, in/f^(i+1)) (``util.py:168,178``)
        width = max(self.output_dim, int(self.input_dim / self.reduction_factor))
        for i in range(self.num_layers):
            x = nn.Dense(width, kernel_init=XAVIER, dtype=self.dtype)(x)
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=deterministic)
            width = max(
                self.output_dim,
                int(self.input_dim / (self.reduction_factor ** (i + 1))),
            )
        return nn.Dense(self.output_dim, kernel_init=XAVIER, dtype=self.dtype)(x)


class GRUUnit(nn.Module):
    """Masked GRU cell fusing SDE state with per-step observations.

    Reference: ``models/utils/ode_utils.py:111-152`` — update/reset/new-state
    MLP gates (Dense → tanh → Dense [→ sigmoid]), with the mask gating the
    carry: ``h_next = m * h_next + (1 - m) * h_cur``.  Reference init is
    normal(0, 0.1) with zero bias (``init_network_weights``).
    """

    latent_dim: int
    n_units: int
    dtype: Any = None
    packed: bool = True  # pack update+reset gates (shared input) into one
                         # full-width matmul chain; identical params + math

    @nn.compact
    def __call__(self, h_cur: jax.Array, x: jax.Array, mask: jax.Array) -> jax.Array:
        init = nn.initializers.normal(stddev=0.1)
        concat = jnp.concatenate([h_cur, x], axis=-1)

        if self.packed:
            din = concat.shape[-1]
            banks = {
                name: ParamDense(
                    din if name.endswith("_0") else self.n_units,
                    self.n_units if name.endswith("_0") else self.latent_dim,
                    kernel_init=init,
                    name=name,
                )()
                for name in (
                    "update_gate_0", "update_gate_1",
                    "reset_gate_0", "reset_gate_1",
                    "new_state_0", "new_state_1",
                )
            }
            update, reset = packed_mlp_eval(
                [
                    [banks["update_gate_0"], banks["update_gate_1"]],
                    [banks["reset_gate_0"], banks["reset_gate_1"]],
                ],
                concat,
                dtype=self.dtype,
            )
            update = nn.sigmoid(update)
            reset = nn.sigmoid(reset)
            # new_state depends on reset's output — inherently sequential
            combined = jnp.concatenate([x, reset * h_cur], axis=-1)
            (new_state,) = packed_mlp_eval(
                [[banks["new_state_0"], banks["new_state_1"]]], combined, dtype=self.dtype
            )
        else:
            def gate_net(name: str, out_dim: int, inp: jax.Array) -> jax.Array:
                h = nn.Dense(self.n_units, kernel_init=init, dtype=self.dtype, name=f"{name}_0")(inp)
                h = nn.tanh(h)
                return nn.Dense(out_dim, kernel_init=init, dtype=self.dtype, name=f"{name}_1")(h)

            update = nn.sigmoid(gate_net("update_gate", self.latent_dim, concat))
            reset = nn.sigmoid(gate_net("reset_gate", self.latent_dim, concat))
            combined = jnp.concatenate([x, reset * h_cur], axis=-1)
            new_state = gate_net("new_state", self.latent_dim, combined)

        h_next = (1.0 - update) * new_state + update * h_cur
        m = mask[..., None].astype(h_cur.dtype)
        return m * h_next + (1.0 - m) * h_cur
