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
    """Per-input 2-layer MLPs summed, then aggregated (``embedding.py:43-70``).

    ``packed=True`` evaluates the per-branch ``dense1`` matmuls as ONE
    vstacked matmul: ``Σᵢ hᵢ @ Wᵢ = [h₀‖h₁] @ [W₀; W₁]`` (exact; biases
    sum).  Parameter tree identical to the per-layer path.
    """

    out_channel: int
    dtype: Any = None
    packed: bool = False  # MEASURED SLOWER at production shapes (78.5 vs
                          # 76.9 ms/step): the [.., 2D] concat intermediate
                          # on the pair tensor costs more HBM traffic than
                          # the vstacked matmul saves.  Knob + parity test.

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        hidden = []
        for i, x in enumerate(inputs):
            h = nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype, name=f"in{i}_dense0")(x)
            h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name=f"in{i}_ln0")(h)
            hidden.append(nn.relu(h))
        if self.packed:
            from trajsde_tpu.models.layers import ParamDense

            banks = [
                ParamDense(self.out_channel, self.out_channel, name=f"in{i}_dense1")()
                for i in range(len(inputs))
            ]
            w = jnp.concatenate([b["kernel"] for b in banks], axis=0)  # vstack
            bias = sum(b["bias"] for b in banks)
            h = jnp.concatenate(hidden, axis=-1)
            if self.dtype is not None:
                h, w, bias = h.astype(self.dtype), w.astype(self.dtype), bias.astype(self.dtype)
            out = h @ w + bias
        else:
            out = sum(
                nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype, name=f"in{i}_dense1")(h)
                for i, h in enumerate(hidden)
            )
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="aggr_ln0")(out)
        out = nn.relu(out)
        out = nn.Dense(self.out_channel, kernel_init=XAVIER, dtype=self.dtype, name="aggr_dense")(out)
        out = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="aggr_ln1")(out)
        return out
