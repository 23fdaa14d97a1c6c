"""Shared UNet encoder backbone for the multitask model family (flax, NHWC).

TPU re-design of the reference's shared encoder
(/root/reference/src/models/components/shared_encoder.py:9-135): DoubleConv
(3×3 conv → norm → ReLU, twice), maxpool downs over ``features`` channel
widths, returning (bottleneck, skips-reversed). The reference normalizes with
BatchNorm + Lightning sync-BN (configs/trainer/ddp.yaml:9); the idiomatic TPU
swap is GroupNorm (no cross-replica running stats, fuses cleanly under jit) —
``norm='batch'`` is still available and uses a ``batch_stats`` collection with
cross-device axis reduction when an axis name is bound.

Also hosts the sinusoidal ``TimeEmbedding`` used by the flow decoder
(ref: shared_encoder.py:107-135 — sin‖cos ordering, log-spaced frequencies).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stain2stain_tpu.ops.time_embedding import timestep_embedding_sincos


class Norm2d(nn.Module):
    """Selectable GroupNorm (TPU default) or BatchNorm (reference parity).

    BatchNorm stats need no axis_name here: under jit the batch axis spans
    the whole mesh, so jnp means over it are already GLOBAL — sync-BN (the
    reference's ddp.yaml:9) falls out of the sharding."""

    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        if self.norm == "batch":
            return nn.BatchNorm(use_running_average=not train, dtype=jnp.float32)(x)
        from .unet import _gn_groups

        return nn.GroupNorm(num_groups=_gn_groups(x.shape[-1]), dtype=jnp.float32)(x)


class DoubleConv(nn.Module):
    """(3×3 conv → norm → ReLU) × 2."""

    out_channels: int
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name=f"conv_{i}")(x)
            x = Norm2d(self.norm, dtype=self.dtype, name=f"norm_{i}")(x, train=train)
            x = nn.relu(x).astype(self.dtype)
        return x


class SharedEncoder(nn.Module):
    """UNet encoder: returns (bottleneck, [skips deepest-first])."""

    in_channels: int = 3
    features: Sequence[int] = (64, 128, 256, 512, 1024)
    return_skip_connections: bool = True
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False):
        x = x.astype(self.dtype)
        skips = []
        x = DoubleConv(self.features[0], self.norm, self.dtype, name="inc")(x, train=train)
        skips.append(x)
        for i, feat in enumerate(self.features[1:]):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = DoubleConv(feat, self.norm, self.dtype, name=f"down_{i}")(x, train=train)
            skips.append(x)
        bottleneck = skips[-1]
        if self.return_skip_connections:
            return bottleneck, skips[:-1][::-1]
        return bottleneck, []


class TimeEmbedding(nn.Module):
    """Sinusoidal time embedding, (B,) → (B, dim); sin‖cos ordering."""

    dim: int = 256

    def __call__(self, t: jax.Array) -> jax.Array:
        if t.ndim == 2:
            t = t[:, 0]
        return timestep_embedding_sincos(t, self.dim)


__all__ = ["SharedEncoder", "DoubleConv", "Norm2d", "TimeEmbedding"]
