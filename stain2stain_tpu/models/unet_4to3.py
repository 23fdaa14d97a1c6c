"""4-channel-in / 3-channel-out UNet wrapper for mask-conditioned CFM.

Parity component for /root/reference/src/models/components/unet_4to3.py:8-81:
the RGB+mask → RGB velocity net used by the mask-conditioned variants
(configs/model/conditional_flow_matching_masked_condition.yaml:18-30). Here it
is just a thin constructor around :class:`~stain2stain_tpu.models.unet.UNetModel`
with ``in_channels=4``/``out_channels=3`` — conditioning inputs are concatenated
on the channel axis by the task module.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
from flax import linen as nn

from .unet import UNetModel


class UNet4to3(nn.Module):
    image_size: int = 256
    num_channels: int = 128
    num_res_blocks: int = 2
    channel_mult: Sequence[int] = (1, 2, 2, 4)
    # raw downsample rates, matching the reference wrapper's (16, 8) default
    # (unet_4to3.py:22 passes them straight to guided-diffusion UNetModel,
    # where ds=8 attends at level 3) — NOT the "16,8" string convention
    attention_resolutions: Any = (16, 8)
    dropout: float = 0.0
    num_heads: int = 4
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, t: jax.Array, x: jax.Array, *, train: bool = False) -> jax.Array:
        import jax.numpy as jnp

        net = UNetModel(
            dim=(4, self.image_size, self.image_size),
            num_channels=self.num_channels,
            num_res_blocks=self.num_res_blocks,
            channel_mult=tuple(self.channel_mult),
            attention_resolutions=self.attention_resolutions,
            dropout=self.dropout,
            num_heads=self.num_heads,
            num_head_channels=self.num_head_channels,
            use_scale_shift_norm=self.use_scale_shift_norm,
            out_channels=3,
            dtype=self.dtype if self.dtype is not None else jnp.float32,
            name="unet",
        )
        return net(t, x, train=train)


__all__ = ["UNet4to3"]
