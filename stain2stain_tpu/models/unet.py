"""ADM-style UNet velocity network, re-derived for TPU (flax, NHWC).

This is the first-party replacement for the external guided-diffusion-style
``torchcfm.models.unet.UNetModel`` that the reference uses as its main
velocity net (cfg: /root/reference/configs/model/conditional_flow_matching.yaml:16-26;
used at src/models/conditional_flow_matching.py:51). Architecture re-derived
from the published ADM design (Dhariwal & Nichol 2021):

- timestep embedding → 2-layer SiLU MLP (model_channels → 4·model_channels)
- optional class embedding added to the time embedding (``class_cond``)
- residual blocks: GroupNorm(32) → SiLU → 3×3 conv, FiLM time conditioning
  (``use_scale_shift_norm``: h = norm(h)·(1+scale)+shift), zero-init out conv
- self-attention blocks at configured feature resolutions + in the middle
  block, multi-head with ``num_head_channels`` per head
- down path: conv stride-2; up path: nearest ×2 + conv; skip concatenation

TPU-first choices: NHWC layout throughout (XLA's native conv layout on TPU),
bf16 compute / f32 params via the ``dtype`` knob, attention in f32,
``remat`` option for rematerialized res-blocks, static shapes everywhere.

The constructor keys are torchcfm-config-compatible (``dim``, ``num_channels``,
``attention_resolutions`` as a "16,8" string of feature sizes, ``channel_mult``,
``class_cond``/``num_classes``, …) so the reference's model configs drop in
unchanged. ``attention_resolutions`` follows the ADM convention: entry ``r``
attends where the downsample ratio equals ``image_size // r``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from stain2stain_tpu.ops.time_embedding import timestep_embedding_adm


def _gn_groups(channels: int) -> int:
    """Largest group count ≤ 32 that divides the channels.

    ADM uses GroupNorm(32) and guarantees divisibility by choosing channel
    widths that are multiples of 32; small test configs (and up-path concat
    widths like 48) need the fallback to the largest divisor.
    """
    groups = min(32, channels)
    while channels % groups:
        groups -= 1
    return groups


class ResBlock(nn.Module):
    """ADM residual block with FiLM time-embedding conditioning."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False) -> jax.Array:
        # ``train`` is positional (not keyword-only) so nn.remat can mark it
        # static (static_argnums) — a traced bool breaks dropout's branch.
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=_gn_groups(in_ch), dtype=jnp.float32)(x)
        h = nn.silu(h).astype(self.dtype)

        if self.up:
            h = _upsample_nearest(h)
            x = _upsample_nearest(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)

        emb_out_dim = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_out_dim, dtype=self.dtype, name="emb_proj")(nn.silu(emb.astype(self.dtype)))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = nn.GroupNorm(num_groups=_gn_groups(self.out_channels), dtype=jnp.float32)(h)
            h = h.astype(self.dtype) * (1.0 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.GroupNorm(num_groups=_gn_groups(self.out_channels), dtype=jnp.float32)(h)
            h = nn.silu(h).astype(self.dtype)

        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(
            self.out_channels,
            (3, 3),
            padding=1,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="conv_out",
        )(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip_proj")(x)
        return (x + h).astype(self.dtype)


class AttentionBlock(nn.Module):
    """Spatial self-attention over the (H·W) token grid, residual.

    On TPU the softmax(q·kᵀ)·v core runs as the fused Pallas kernel
    (ops/pallas_attention.py) — logits never leave VMEM, removing the train
    step's largest HBM allocation; einsum fallback elsewhere. Total scaling
    is 1/√d, equal to the published ADM 1/√√d-per-side convention.
    """

    num_heads: int
    dtype: Any = jnp.float32
    use_fused: Optional[bool] = None  # None = auto (Pallas on TPU)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from stain2stain_tpu.ops.pallas_attention import attention

        batch, height, width, chans = x.shape
        head_dim = chans // self.num_heads
        h = nn.GroupNorm(num_groups=_gn_groups(chans), dtype=jnp.float32)(x).astype(self.dtype)
        h = h.reshape(batch, height * width, chans)
        qkv = nn.Dense(3 * chans, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(batch, -1, self.num_heads, head_dim)

        out = attention(heads(q), heads(k), heads(v), head_dim, use_fused=self.use_fused)
        out = out.reshape(batch, height * width, chans).astype(self.dtype)
        out = nn.Dense(chans, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="proj")(out)
        return x + out.reshape(batch, height, width, chans)


def _upsample_nearest(x: jax.Array) -> jax.Array:
    batch, height, width, chans = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (batch, height, 2, width, 2, chans))
    return x.reshape(batch, height * 2, width * 2, chans)


class Downsample(nn.Module):
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=1, dtype=self.dtype)(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _upsample_nearest(x)
        if self.use_conv:
            x = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype)(x)
        return x


class UNetModel(nn.Module):
    """Config-compatible ADM UNet: ``apply(vars, t, x, y=None, train=...)``.

    ``dim``: (C, H, W) of the input; ``attention_resolutions``: comma string of
    feature-map sizes ("16,8"), or an explicit sequence of downsample ratios.
    """

    dim: Sequence[int] = (3, 256, 256)
    num_channels: int = 128
    num_res_blocks: int = 2
    channel_mult: Sequence[int] = (1, 2, 2, 4)
    attention_resolutions: Any = "16"
    dropout: float = 0.0
    num_heads: int = 4
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    class_cond: bool = False
    num_classes: Optional[int] = None
    out_channels: Optional[int] = None  # defaults to dim[0]
    conv_resample: bool = True
    use_checkpoint: bool = False  # remat res-blocks to trade FLOPs for HBM
    fused_attention: Optional[bool] = None  # None = Pallas kernel on TPU
    dtype: Any = jnp.float32

    def _attention_ds(self) -> tuple:
        image_size = self.dim[-1]
        if isinstance(self.attention_resolutions, str):
            if not self.attention_resolutions.strip():
                return ()
            return tuple(
                image_size // int(r) for r in self.attention_resolutions.split(",")
            )
        return tuple(int(r) for r in self.attention_resolutions)

    def _num_heads_for(self, chans: int) -> int:
        if self.num_head_channels != -1:
            return max(chans // self.num_head_channels, 1)
        return self.num_heads

    @nn.compact
    def __call__(
        self,
        t: jax.Array,
        x: jax.Array,
        y: Optional[jax.Array] = None,
        *,
        train: bool = False,
    ) -> jax.Array:
        """t: () or (B,) in [0,1]; x: (B, H, W, C) NHWC; y: (B,) int labels."""
        if t.ndim == 0:
            t = jnp.full((x.shape[0],), t, dtype=jnp.float32)
        mc = self.num_channels
        time_dim = mc * 4
        attention_ds = self._attention_ds()
        res_block = nn.remat(ResBlock, static_argnums=(3,)) if self.use_checkpoint else ResBlock

        emb = timestep_embedding_adm(t, mc)
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_dense_0")(emb.astype(self.dtype))
        emb = nn.Dense(time_dim, dtype=self.dtype, name="time_dense_1")(nn.silu(emb))
        if self.class_cond:
            if self.num_classes is None:
                raise ValueError("class_cond=True requires num_classes")
            if y is None:
                raise ValueError("class-conditional UNet called without labels y")
            emb = emb + nn.Embed(self.num_classes, time_dim, dtype=self.dtype, name="label_emb")(y)

        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="conv_stem")(x.astype(self.dtype))
        skips = [h]
        ds = 1
        # Down path
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = res_block(
                    mult * mc,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"down_{level}_res_{i}",
                )(h, emb, train)
                if ds in attention_ds:
                    h = AttentionBlock(
                        self._num_heads_for(h.shape[-1]), dtype=self.dtype,
                        use_fused=self.fused_attention, name=f"down_{level}_attn_{i}"
                    )(h)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res_block(
                        h.shape[-1],
                        dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True,
                        dtype=self.dtype,
                        name=f"down_{level}_downres",
                    )(h, emb, train)
                else:
                    h = Downsample(self.conv_resample, dtype=self.dtype, name=f"down_{level}_down")(h)
                skips.append(h)
                ds *= 2

        # Middle
        h = res_block(
            h.shape[-1],
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
            name="mid_res_0",
        )(h, emb, train)
        h = AttentionBlock(
            self._num_heads_for(h.shape[-1]), dtype=self.dtype,
            use_fused=self.fused_attention, name="mid_attn"
        )(h)
        h = res_block(
            h.shape[-1],
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
            name="mid_res_1",
        )(h, emb, train)

        # Up path
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = res_block(
                    mult * mc,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"up_{level}_res_{i}",
                )(h, emb, train)
                if ds in attention_ds:
                    h = AttentionBlock(
                        self._num_heads_for(h.shape[-1]), dtype=self.dtype,
                        use_fused=self.fused_attention, name=f"up_{level}_attn_{i}"
                    )(h)
            if level != 0:
                if self.resblock_updown:
                    h = res_block(
                        h.shape[-1],
                        dropout=self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        up=True,
                        dtype=self.dtype,
                        name=f"up_{level}_upres",
                    )(h, emb, train)
                else:
                    h = Upsample(self.conv_resample, dtype=self.dtype, name=f"up_{level}_up")(h)
                ds //= 2

        assert not skips, "skip bookkeeping mismatch"
        out_ch = self.out_channels if self.out_channels is not None else self.dim[0]
        h = nn.GroupNorm(num_groups=_gn_groups(h.shape[-1]), dtype=jnp.float32)(h)
        h = nn.silu(h).astype(self.dtype)
        h = nn.Conv(
            out_ch, (3, 3), padding=1, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="conv_out"
        )(h)
        return h.astype(jnp.float32)


__all__ = ["UNetModel", "ResBlock", "AttentionBlock", "Downsample", "Upsample"]
