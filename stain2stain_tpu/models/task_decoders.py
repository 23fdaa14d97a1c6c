"""Dual decoder heads for the multitask model family (flax, NHWC).

TPU re-design of /root/reference/src/models/components/task_decoders.py:
``FlowMatchingDecoder`` (time-conditioned velocity head, task_decoders.py:53-134)
and ``SegmentationDecoder`` (mask head, task_decoders.py:137-194). Both walk
the UNet up-path: 2× upsample → concat skip → DoubleConv, then a 1×1 out conv.
Time conditioning matches the reference: t-emb → SiLU MLP → linear projection
to bottleneck channels, **added** per-channel to the bottleneck.

Upsampling is bilinear with ``align_corners=True`` grid semantics — the
reference's ``nn.Upsample(mode="bilinear", align_corners=True)``
(task_decoders.py:34). ``jax.image.resize`` has no align_corners mode (it is
half-pixel only), so the separable corner-aligned interpolation is built from
two 1-D lerps. With power-of-two tile sizes the pad-to-match branch of the
reference is a no-op, so shapes always align statically here.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .shared_encoder import DoubleConv


def _interp_axis_align_corners(x: jax.Array, axis: int, out_len: int) -> jax.Array:
    """1-D linear interpolation along ``axis`` with corner-aligned sampling:
    out[o] samples input at o*(in-1)/(out-1) (torch align_corners=True)."""
    in_len = x.shape[axis]
    if in_len == 1:
        return jnp.repeat(x, out_len, axis=axis)
    src = jnp.linspace(0.0, in_len - 1.0, out_len)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_len - 1)
    w = (src - lo).astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = out_len
    w = w.reshape(shape)
    return jnp.take(x, lo, axis=axis) * (1 - w) + jnp.take(x, hi, axis=axis) * w


def _upsample_bilinear(x: jax.Array) -> jax.Array:
    _, height, width, _ = x.shape
    x = _interp_axis_align_corners(x, 1, height * 2)
    return _interp_axis_align_corners(x, 2, width * 2)


class Up(nn.Module):
    """Upscale ×2 (bilinear), concat skip, DoubleConv."""

    out_channels: int
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, skip: jax.Array, *, train: bool = False) -> jax.Array:
        x = _upsample_bilinear(x).astype(self.dtype)
        x = jnp.concatenate([skip.astype(self.dtype), x], axis=-1)
        return DoubleConv(self.out_channels, self.norm, self.dtype, name="conv")(x, train=train)


class FlowMatchingDecoder(nn.Module):
    """Head A: velocity field for stain translation, time-conditioned."""

    bottleneck_channels: int = 1024
    features: Sequence[int] = (512, 256, 128, 64)
    out_channels: int = 3
    time_emb_dim: int = 256
    bilinear: bool = True  # config-parity knob; bilinear is the only up mode
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        bottleneck: jax.Array,
        skips: Sequence[jax.Array],
        t_emb: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        t = nn.Dense(self.time_emb_dim, dtype=self.dtype, name="time_mlp_0")(t_emb.astype(self.dtype))
        t = nn.Dense(self.time_emb_dim, dtype=self.dtype, name="time_mlp_1")(nn.silu(t))
        t = nn.Dense(self.bottleneck_channels, dtype=self.dtype, name="time_proj")(t)
        x = bottleneck.astype(self.dtype) + t[:, None, None, :]
        for i, (feat, skip) in enumerate(zip(self.features, skips)):
            x = Up(feat, self.norm, self.dtype, name=f"up_{i}")(x, skip, train=train)
        velocity = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="outc")(x)
        return velocity.astype(jnp.float32)


class SegmentationDecoder(nn.Module):
    """Head B: segmentation logits (1 ch binary / C-class)."""

    bottleneck_channels: int = 1024
    features: Sequence[int] = (512, 256, 128, 64)
    out_channels: int = 1
    bilinear: bool = True  # config-parity knob; bilinear is the only up mode
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, bottleneck: jax.Array, skips: Sequence[jax.Array], *, train: bool = False
    ) -> jax.Array:
        x = bottleneck.astype(self.dtype)
        for i, (feat, skip) in enumerate(zip(self.features, skips)):
            x = Up(feat, self.norm, self.dtype, name=f"up_{i}")(x, skip, train=train)
        logits = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="outc")(x)
        return logits.astype(jnp.float32)


__all__ = ["FlowMatchingDecoder", "SegmentationDecoder", "Up"]
