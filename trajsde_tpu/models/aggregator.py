"""Global interaction aggregator (reference: ``models/aggregators/agg_hivt.py``)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from trajsde_tpu.data.scene import SceneBatch
from trajsde_tpu.models import graph
from trajsde_tpu.models.embedding import MultipleInputEmbedding, SingleInputEmbedding
from trajsde_tpu.models.layers import LN_EPS, XAVIER, EdgeAttention, MlpBlock


class GlobalInteractorLayer(nn.Module):
    """Edge-aware attention layer (``agg_hivt.py:61-135``)."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        mask: jax.Array,
        rel_embed: jax.Array,
        deterministic: bool = True,
    ) -> jax.Array:
        attn = EdgeAttention(
            self.embed_dim, self.num_heads, self.dropout, dtype=self.dtype, name="attn"
        )
        normed = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
        # key/value = node + edge streams (``agg_hivt.py:108-117``).  Note the
        # reference projects the NORMED x for keys/values too (propagate is
        # called with x = norm1(x)).
        x = x + attn(
            normed, mask, kv_node=normed, kv_edge=rel_embed, deterministic=deterministic
        )
        x = x + MlpBlock(self.embed_dim, self.dropout, dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x), deterministic
        )
        return x


class GlobalInteractor(nn.Module):
    """Global agent-agent interaction at the reference step → per-mode embeds.

    ``__call__(scene, local_embed [B, A, D])`` → ``[B, F, A, D]`` where
    ``F = num_modes`` (reference returns [F, N, D], ``agg_hivt.py:56-58``).
    """

    historical_steps: int
    embed_dim: int
    num_modes: int
    num_heads: int = 8
    num_layers: int = 3
    dropout: float = 0.1
    rotate: bool = True
    edge_dim: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(
        self, scene: SceneBatch, local_embed: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        D = self.embed_dim
        mask, rel_pos, rel_theta = graph.global_edges(scene, self.historical_steps - 1)

        if self.rotate:
            rot = scene.rotate_mat()
            # rotate rel_pos into the receiver's frame (``agg_hivt.py:47``)
            rel_pos_local = jnp.einsum("bakj,baji->baki", rel_pos, rot)
            rel_theta_feat = jnp.stack(
                [jnp.cos(rel_theta), jnp.sin(rel_theta)], axis=-1
            )
            rel_embed = MultipleInputEmbedding(D, dtype=self.dtype, name="rel_embed")(
                [rel_pos_local, rel_theta_feat]
            )
        else:
            rel_embed = SingleInputEmbedding(D, dtype=self.dtype, name="rel_embed")(rel_pos)

        x = local_embed if self.dtype is None else local_embed.astype(self.dtype)
        for i in range(self.num_layers):
            x = GlobalInteractorLayer(
                D, self.num_heads, self.dropout, dtype=self.dtype, name=f"layer{i}"
            )(x, mask, rel_embed, deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(
            self.num_modes * D, kernel_init=XAVIER, dtype=self.dtype, name="multihead_proj"
        )(x)
        B, A = x.shape[0], x.shape[1]
        x = x.reshape(B, A, self.num_modes, D)
        return jnp.transpose(x, (0, 2, 1, 3)).astype(jnp.float32)  # [B, F, A, D]
