"""Template MLP for the MNIST demo task.

Parity component for /root/reference/src/models/components/simple_dense_net.py:5-50
(Linear→BN→ReLU stack over flattened 28×28 input; BatchNorm swapped for
LayerNorm, the jit-friendly equivalent for an MLP).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class SimpleDenseNet(nn.Module):
    input_size: int = 784
    lin1_size: int = 64
    lin2_size: int = 128
    lin3_size: int = 64
    output_size: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        batch = x.shape[0]
        x = x.reshape(batch, -1).astype(self.dtype)
        for i, size in enumerate((self.lin1_size, self.lin2_size, self.lin3_size)):
            x = nn.Dense(size, dtype=self.dtype, name=f"dense_{i}")(x)
            x = nn.LayerNorm(dtype=jnp.float32, name=f"norm_{i}")(x).astype(self.dtype)
            x = nn.relu(x)
        return nn.Dense(self.output_size, dtype=self.dtype, name="head")(x).astype(jnp.float32)


__all__ = ["SimpleDenseNet"]
