"""Input embedding stacks (reference: ``models/utils/embedding.py:22-70``)."""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

XAVIER = nn.initializers.xavier_uniform()
LN_EPS = 1e-5  # torch LayerNorm default, for numerical parity


class SingleInputEmbedding(nn.Module):
    """3×(Dense → LN → ReLU) with a final LN (reference ``embedding.py:22-40``)."""

    out_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for _ in range(2):
            x = nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype)(x)
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype)(x)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype)(x)
        return x


class MultipleInputConcatEmbedding(nn.Module):
    """Concat variant: per-input half-width MLPs concatenated then
    aggregated (``embedding.py:72-99`` — present in the reference, unused
    by its shipped configs)."""

    out_channel: int

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        half = self.out_channel // 2
        embedded = []
        for i, x in enumerate(inputs):
            h = nn.Dense(half, kernel_init=XAVIER, name=f"in{i}_dense0")(x)
            h = nn.LayerNorm(epsilon=LN_EPS, name=f"in{i}_ln0")(h)
            h = nn.relu(h)
            h = nn.Dense(half, kernel_init=XAVIER, name=f"in{i}_dense1")(h)
            embedded.append(h)
        out = jnp.concatenate(embedded, axis=-1)
        out = nn.LayerNorm(epsilon=LN_EPS, name="aggr_ln0")(out)
        out = nn.relu(out)
        out = nn.Dense(self.out_channel, kernel_init=XAVIER, name="aggr_dense")(out)
        out = nn.LayerNorm(epsilon=LN_EPS, name="aggr_ln1")(out)
        return out


class MultipleInputEmbedding(nn.Module):
    """Per-input 2-layer MLPs summed, then aggregated (``embedding.py:43-70``)."""

    out_channel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        embedded = []
        for i, x in enumerate(inputs):
            h = nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype, name=f"in{i}_dense0")(x)
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f"in{i}_ln0")(h)
            h = nn.relu(h)
            h = nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype, name=f"in{i}_dense1")(h)
            embedded.append(h)
        out = sum(embedded)
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="aggr_ln0")(out)
        out = nn.relu(out)
        out = nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype, name="aggr_dense")(out)
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="aggr_ln1")(out)
        return out
