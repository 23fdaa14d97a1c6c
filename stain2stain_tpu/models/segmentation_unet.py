"""Standalone segmentation UNet (flax, NHWC).

Parity component for /root/reference/src/models/components/segmentation_unet.py:77-134
(a 4-level UNet that is defined but unreferenced by any reference config; kept
so the component inventory is complete and usable).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .shared_encoder import DoubleConv
from .task_decoders import Up


class SegmentationUNet(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    features: Sequence[int] = (64, 128, 256, 512)
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        skips = []
        for i, feat in enumerate(self.features):
            x = DoubleConv(feat, self.norm, self.dtype, name=f"enc_{i}")(x, train=train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # bilinear=True halves the doubled widths (ref segmentation_unet.py:
        # factor=2 -> down4 = features[3]*2//2 and up_k out = features[k]//2,
        # with the last up staying at features[0])
        x = DoubleConv(self.features[-1], self.norm, self.dtype, name="bottleneck")(x, train=train)
        dec_feats = [f // 2 for f in reversed(self.features[1:])] + [self.features[0]]
        for i, (feat, skip) in enumerate(zip(dec_feats, reversed(skips))):
            x = Up(feat, self.norm, self.dtype, name=f"dec_{i}")(x, skip, train=train)
        logits = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="outc")(x)
        return logits.astype(jnp.float32)


__all__ = ["SegmentationUNet"]
