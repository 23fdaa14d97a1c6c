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
static shapes everywhere, and a two-tier rematerialization knob
(``use_checkpoint``): ``"block"`` remats each res/attention block (saves every
block input), ``"level"`` remats whole resolution levels (saves only level
boundaries + skips). Measured round 3: batch 64 @ 256px does NOT fit on one
v5e chip even with level remat (flagship train step OOMs); batch 32 without
source remat is the 256px operating point, and 512px trains at batch 4 with
level remat.
The up-path skip concatenation happens INSIDE the rematted region, so the
double-width concat tensors — the dominant HLO temps at 256px — are
recomputed in the backward instead of stored.

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

from stain2stain_tpu.ops import pallas_conv
from stain2stain_tpu.ops import s2b_conv as s2b_conv_ops
from stain2stain_tpu.ops.dropout import FastDropout
from stain2stain_tpu.ops.norms import group_norm, group_norm_film_silu, group_norm_silu
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


class FusedGroupNorm(nn.Module):
    """GroupNorm(32) with the fused, memory-lean custom-VJP ops (ops/norms.py).

    ``tail``: "none" (plain GN), "silu" (GN→SiLU), "film_silu"
    (GN→·(1+scale)+shift→SiLU). Statistics in f32, output in x.dtype; the
    backward saves only (x, mean, rstd) instead of flax GroupNorm's f32
    internals — the change that lets 256px batch 64 fit on one v5e chip.
    eps=1e-5 matches torch.nn.GroupNorm (the reference's norm).
    """

    tail: str = "none"
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, scale=None, shift=None):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        groups = _gn_groups(c)
        if self.tail == "film_silu":
            return group_norm_film_silu(x, gamma, beta, scale, shift, groups, self.eps)
        if self.tail == "silu":
            return group_norm_silu(x, gamma, beta, groups, self.eps)
        return group_norm(x, gamma, beta, groups, self.eps)


class _GNParams(nn.Module):
    """Declares GroupNorm γ/β with FusedGroupNorm's param names ('scale',
    'bias') so fused- and unfused-conv checkpoints are interchangeable."""

    features: int

    @nn.compact
    def __call__(self):
        gamma = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return gamma, beta


class _Conv3Params(nn.Module):
    """Declares a 3×3 conv kernel/bias with nn.Conv's param names/shapes."""

    in_ch: int
    out_ch: int
    zeros_init: bool = False

    @nn.compact
    def __call__(self):
        init = nn.initializers.zeros if self.zeros_init else nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (3, 3, self.in_ch, self.out_ch), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,), jnp.float32)
        return kernel, bias


class ResBlock(nn.Module):
    """ADM residual block with FiLM time-embedding conditioning.

    ``fused_conv=True`` selects the Pallas GN→(FiLM)→SiLU→dropout→conv
    pipeline (ops/pallas_conv.py) when the level shape meets the kernel's
    layout contract (TPU + bf16 only). It is OFF by default: the measured
    A/B at the flagship level shapes (scripts/fused_conv_bench.py, round 3)
    put the fused fwd+bwd at ~44% MFU vs XLA's ~63% for the same composite —
    XLA's conv backward kernels are better than the per-op probes suggested.
    The fused path's remaining edge is memory: its custom VJP stores only raw
    inputs (no normalized activations), so it can substitute for
    rematerialization at memory-bound operating points (512px). Param
    names/shapes are identical across fused/unfused, so checkpoints are
    interchangeable.
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    fused_conv: Optional[bool] = None
    s2b_conv: Optional[int] = None  # factor f>=2 routes the 3x3 convs through
    # ops/s2b_conv.py (f x f halo tiles -> one batch-rich VALID conv) — the
    # low-batch/large-spatial throughput lever found by the round-4 512px
    # roofline (BASELINE.md); param names/shapes identical to nn.Conv so
    # checkpoints are interchangeable.
    dtype: Any = jnp.float32

    def _fused_enabled(self, x: jax.Array) -> bool:
        if not self.fused_conv:  # None/False: measured slower than XLA's
            return False  # conv bwd (scripts/fused_conv_bench.py); opt-in only
        if (
            self.up
            or self.down
            or not self.use_scale_shift_norm
            or self.dtype != jnp.bfloat16
            or jax.default_backend() != "tpu"
        ):
            return False
        in_ch = x.shape[-1]
        return pallas_conv.supported(
            x.shape, (3, 3, in_ch, self.out_channels)
        ) and pallas_conv.supported(
            (*x.shape[:3], self.out_channels),
            (3, 3, self.out_channels, self.out_channels),
        )

    def _s2b_factor(self, h: jax.Array) -> int:
        """Tile factor for this level's shape, or 0 for the plain conv path."""
        f = int(self.s2b_conv or 0)
        if f < 2 or self.up or self.down:
            return 0
        H, W = h.shape[1], h.shape[2]
        # Tiles below 16px pay more halo shuffle than they recover in MXU
        # occupancy, and non-divisible grids can't tile at all.
        if H % f or W % f or min(H, W) // f < 16:
            return 0
        return f

    def _conv3(self, h: jax.Array, out_ch: int, name: str, zeros_init: bool = False) -> jax.Array:
        f = self._s2b_factor(h)
        if f:
            kernel, bias = _Conv3Params(
                h.shape[-1], out_ch, zeros_init=zeros_init, name=name
            )()
            y = s2b_conv_ops.space_to_batch_conv(
                h, kernel.astype(self.dtype), factor=f
            )
            return y + bias.astype(y.dtype)
        init = nn.initializers.zeros if zeros_init else nn.initializers.lecun_normal()
        return nn.Conv(
            out_ch, (3, 3), padding=1, dtype=self.dtype, kernel_init=init, name=name
        )(h)

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False) -> jax.Array:
        # ``train`` is positional (not keyword-only) so nn.remat can mark it
        # static (static_argnums) — a traced bool breaks dropout's branch.
        in_ch = x.shape[-1]

        if self._fused_enabled(x):
            return self._fused_call(x, emb, train)

        h = FusedGroupNorm(tail="silu", name="norm_in")(x).astype(self.dtype)

        if self.up:
            h = _upsample_nearest(h)
            x = _upsample_nearest(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        h = self._conv3(h, self.out_channels, "conv_in")

        emb_out_dim = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_out_dim, dtype=self.dtype, name="emb_proj")(nn.silu(emb.astype(self.dtype)))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = FusedGroupNorm(tail="film_silu", name="norm_out")(h, scale, shift)
        else:
            h = FusedGroupNorm(tail="silu", name="norm_out")(h + emb_out)
        h = h.astype(self.dtype)

        # FastDropout = nn.Dropout semantics at ~zero HBM traffic: the default
        # counter-hash mask fuses into the surrounding chain and the custom-VJP
        # backward regenerates it instead of storing it (ops/dropout.py;
        # measured A/B in scripts/dropout_bench.py + step_ablation.py).
        h = FastDropout(self.dropout)(h, not train)
        h = self._conv3(h, self.out_channels, "conv_out", zeros_init=True)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="skip_proj")(x)
        return (x + h).astype(self.dtype)

    def _fused_call(self, x: jax.Array, emb: jax.Array, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        gamma_in, beta_in = _GNParams(in_ch, name="norm_in")()
        k_in, b_in = _Conv3Params(in_ch, self.out_channels, name="conv_in")()
        h = pallas_conv.norm_act_conv(
            x, k_in, b_in, gamma_in, beta_in,
            groups=_gn_groups(in_ch), act="silu",
        )

        emb_out = nn.Dense(
            2 * self.out_channels, dtype=self.dtype, name="emb_proj"
        )(nn.silu(emb.astype(self.dtype)))
        film_scale, film_shift = jnp.split(emb_out.astype(jnp.float32), 2, axis=-1)

        rate = self.dropout if train else 0.0
        seed = None
        if rate > 0.0:
            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0, 2**31 - 1, dtype=jnp.int32
            )
        gamma_out, beta_out = _GNParams(self.out_channels, name="norm_out")()
        k_out, b_out = _Conv3Params(
            self.out_channels, self.out_channels, zeros_init=True, name="conv_out"
        )()
        h = pallas_conv.norm_act_conv(
            h, k_out, b_out, gamma_out, beta_out,
            film_scale=film_scale, film_shift=film_shift,
            groups=_gn_groups(self.out_channels), act="silu",
            dropout_rate=rate, seed=seed,
        )

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
        if chans % self.num_heads:
            raise ValueError(
                f"attention channels {chans} not divisible by num_heads="
                f"{self.num_heads} (ADM asserts the same)"
            )
        head_dim = chans // self.num_heads
        h = FusedGroupNorm(name="norm")(x).astype(self.dtype)
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


class _DownBlock(nn.Module):
    """One down-path unit: ResBlock (+ optional attention)."""

    out_channels: int
    heads: int  # 0 = no attention at this resolution
    dropout: float
    use_scale_shift_norm: bool
    fused_attention: Optional[bool]
    fused_conv: Optional[bool]
    s2b_conv: Optional[int]
    dtype: Any

    @nn.compact
    def __call__(self, h: jax.Array, emb: jax.Array, train: bool) -> jax.Array:
        h = ResBlock(
            self.out_channels,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            fused_conv=self.fused_conv,
            s2b_conv=self.s2b_conv,
            dtype=self.dtype,
            name="res",
        )(h, emb, train)
        if self.heads:
            h = AttentionBlock(
                self.heads, dtype=self.dtype, use_fused=self.fused_attention, name="attn"
            )(h)
        return h


class _UpBlock(nn.Module):
    """One up-path unit: skip concat + ResBlock (+ optional attention).

    The concat lives inside so that under remat the double-width tensor is a
    backward-recomputed temp, not a stored residual.
    """

    out_channels: int
    heads: int
    dropout: float
    use_scale_shift_norm: bool
    fused_attention: Optional[bool]
    fused_conv: Optional[bool]
    s2b_conv: Optional[int]
    dtype: Any

    @nn.compact
    def __call__(self, h: jax.Array, skip: jax.Array, emb: jax.Array, train: bool) -> jax.Array:
        h = jnp.concatenate([h, skip], axis=-1)
        h = ResBlock(
            self.out_channels,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            fused_conv=self.fused_conv,
            s2b_conv=self.s2b_conv,
            dtype=self.dtype,
            name="res",
        )(h, emb, train)
        if self.heads:
            h = AttentionBlock(
                self.heads, dtype=self.dtype, use_fused=self.fused_attention, name="attn"
            )(h)
        return h


class _DownLevel(nn.Module):
    """One down-path resolution level: res/attn blocks + trailing downsample.

    The downsample lives INSIDE the level so that under level-granular remat
    the region's output (the next level's saved input) is the small
    post-downsample tensor, not a full-resolution one.
    """

    out_channels: int
    num_res_blocks: int
    heads: int
    dropout: float
    use_scale_shift_norm: bool
    fused_attention: Optional[bool]
    fused_conv: Optional[bool]
    s2b_conv: Optional[int]
    remat_blocks: bool
    dtype: Any
    downsample: str = "none"  # "none" | "conv" | "pool" | "res"

    @nn.compact
    def __call__(self, h: jax.Array, emb: jax.Array, train: bool):
        block_cls = (
            nn.remat(_DownBlock, static_argnums=(3,)) if self.remat_blocks else _DownBlock
        )
        skips = []
        for i in range(self.num_res_blocks):
            h = block_cls(
                self.out_channels,
                self.heads,
                self.dropout,
                self.use_scale_shift_norm,
                self.fused_attention,
                self.fused_conv,
                self.s2b_conv,
                self.dtype,
                name=f"block_{i}",
            )(h, emb, train)
            skips.append(h)
        if self.downsample == "res":
            res_cls = nn.remat(ResBlock, static_argnums=(3,)) if self.remat_blocks else ResBlock
            h = res_cls(
                h.shape[-1],
                dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                down=True,
                dtype=self.dtype,
                name="down",
            )(h, emb, train)
            skips.append(h)
        elif self.downsample in ("conv", "pool"):
            h = Downsample(self.downsample == "conv", dtype=self.dtype, name="down")(h)
            skips.append(h)
        return h, tuple(skips)


class _UpLevel(nn.Module):
    """One up-path resolution level: leading upsample + res/attn blocks.

    The upsample belongs to the START of the level (not the end of the
    previous one) so the saved region input is the low-resolution tensor —
    4× smaller than the upsampled activation it recomputes.
    """

    out_channels: int
    num_res_blocks: int
    heads: int
    dropout: float
    use_scale_shift_norm: bool
    fused_attention: Optional[bool]
    fused_conv: Optional[bool]
    s2b_conv: Optional[int]
    remat_blocks: bool
    dtype: Any
    upsample: str = "none"  # "none" | "conv" | "pool" | "res"

    @nn.compact
    def __call__(self, h: jax.Array, skips: tuple, emb: jax.Array, train: bool) -> jax.Array:
        if self.upsample == "res":
            res_cls = nn.remat(ResBlock, static_argnums=(3,)) if self.remat_blocks else ResBlock
            h = res_cls(
                h.shape[-1],
                dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                up=True,
                dtype=self.dtype,
                name="up",
            )(h, emb, train)
        elif self.upsample in ("conv", "pool"):
            h = Upsample(self.upsample == "conv", dtype=self.dtype, name="up")(h)
        block_cls = (
            nn.remat(_UpBlock, static_argnums=(4,)) if self.remat_blocks else _UpBlock
        )
        for i in range(self.num_res_blocks + 1):
            h = block_cls(
                self.out_channels,
                self.heads,
                self.dropout,
                self.use_scale_shift_norm,
                self.fused_attention,
                self.fused_conv,
                self.s2b_conv,
                self.dtype,
                name=f"block_{i}",
            )(h, skips[i], emb, train)
        return h


class _MidBlocks(nn.Module):
    """Bottleneck: ResBlock → attention → ResBlock."""

    heads: int
    dropout: float
    use_scale_shift_norm: bool
    fused_attention: Optional[bool]
    fused_conv: Optional[bool]
    s2b_conv: Optional[int]
    dtype: Any

    @nn.compact
    def __call__(self, h: jax.Array, emb: jax.Array, train: bool) -> jax.Array:
        kw = dict(
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            fused_conv=self.fused_conv,
            s2b_conv=self.s2b_conv,
            dtype=self.dtype,
        )
        h = ResBlock(h.shape[-1], name="res_0", **kw)(h, emb, train)
        if self.heads > 0:  # heads=0 disables attention (ablation harnesses)
            h = AttentionBlock(
                self.heads, dtype=self.dtype, use_fused=self.fused_attention, name="attn"
            )(h)
        h = ResBlock(h.shape[-1], name="res_1", **kw)(h, emb, train)
        return h


class UNetModel(nn.Module):
    """Config-compatible ADM UNet: ``apply(vars, t, x, y=None, train=...)``.

    ``dim``: (C, H, W) of the input; ``attention_resolutions``: comma string of
    feature-map sizes ("16,8"), or an explicit sequence of downsample ratios.
    ``use_checkpoint``: False (store everything), True/"block" (remat each
    res/attn block), or "level" (remat whole resolution levels — least memory,
    same recompute FLOPs as "block"). Either mode takes an optional ":K"
    suffix ("block:2") restricting remat to the K shallowest levels, which
    hold most of the activation bytes but only ~K/n_levels of the recompute
    FLOPs — the deep levels and the mid block are stored. Parameter structure
    is identical across all modes so checkpoints are interchangeable.
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
    use_checkpoint: Any = False  # False | True/"block" | "level"
    fused_attention: Optional[bool] = None  # None = Pallas kernel on TPU
    fused_conv: Optional[bool] = None  # OPT-IN: None/False = XLA convs (the
    # measured winner, scripts/fused_conv_bench.py); True = Pallas GN+SiLU+conv
    s2b_conv: Optional[int] = None  # OPT-IN tile factor (2 = 2x2) routing the
    # ResBlock 3x3 convs through ops/s2b_conv.py at levels whose spatial dims
    # divide evenly — re-expresses a batch-starved conv as a batch-rich one
    # (the 512px batch-4 lever, BASELINE.md round-4 roofline row). Numerics
    # and params identical to the plain path.
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

    def _remat_mode(self) -> tuple:
        """Returns (mode, depth): mode in {None, 'block', 'level'}; depth=None
        means every level (and the mid block), depth=K restricts remat to the
        K shallowest resolution levels — the ones holding ~2^K/(2^K+...) of
        activation memory — leaving deep levels and mid stored (512px probe:
        shallow-only remat keeps most of the memory win for less recompute)."""
        if self.use_checkpoint is True:
            return "block", None
        if not self.use_checkpoint:
            return None, None
        mode = str(self.use_checkpoint)
        depth: Optional[int] = None
        if ":" in mode:
            mode, _, d = mode.partition(":")
            depth = int(d)
        if mode not in ("block", "level"):
            raise ValueError(
                "use_checkpoint must be False/True/'block'/'level' (optionally "
                f"'block:K'/'level:K' for the K shallowest levels), got {mode!r}"
            )
        return mode, depth

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
        mode, remat_depth = self._remat_mode()

        def _level_mode(level: int) -> Optional[str]:
            if mode is None or (remat_depth is not None and level >= remat_depth):
                return None
            return mode

        def _down_cls(level: int):
            lm = _level_mode(level)
            cls = nn.remat(_DownLevel, static_argnums=(3,)) if lm == "level" else _DownLevel
            return cls, lm == "block"

        def _up_cls(level: int):
            lm = _level_mode(level)
            cls = nn.remat(_UpLevel, static_argnums=(4,)) if lm == "level" else _UpLevel
            return cls, lm == "block"

        # mid runs at the deepest resolution — under a depth-restricted mode it
        # is stored, matching the deep levels around it
        mid_remat = mode is not None and remat_depth is None
        mid_cls = nn.remat(_MidBlocks, static_argnums=(3,)) if mid_remat else _MidBlocks
        resample = "res" if self.resblock_updown else ("conv" if self.conv_resample else "pool")

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
        n_levels = len(self.channel_mult)
        level_cfg = []  # (level, mult, heads) for the up path
        # Down path
        for level, mult in enumerate(self.channel_mult):
            heads = self._num_heads_for(mult * mc) if ds in attention_ds else 0
            level_cfg.append((level, mult, heads))
            last = level == n_levels - 1
            down_level_cls, remat_blocks = _down_cls(level)
            h, level_skips = down_level_cls(
                mult * mc,
                self.num_res_blocks,
                heads,
                self.dropout,
                self.use_scale_shift_norm,
                self.fused_attention,
                self.fused_conv,
                self.s2b_conv,
                remat_blocks,
                self.dtype,
                downsample="none" if last else resample,
                name=f"down_{level}",
            )(h, emb, train)
            skips.extend(level_skips)
            if not last:
                ds *= 2

        # Middle
        h = mid_cls(
            self._num_heads_for(h.shape[-1]),
            self.dropout,
            self.use_scale_shift_norm,
            self.fused_attention,
            self.fused_conv,
            self.s2b_conv,
            self.dtype,
            name="mid",
        )(h, emb, train)

        # Up path: each level upsamples its low-res input first (except the
        # bottom level, which runs at the middle block's resolution).
        for level, mult, heads in reversed(level_cfg):
            level_skips = tuple(skips.pop() for _ in range(self.num_res_blocks + 1))
            up_level_cls, remat_blocks = _up_cls(level)
            h = up_level_cls(
                mult * mc,
                self.num_res_blocks,
                heads,
                self.dropout,
                self.use_scale_shift_norm,
                self.fused_attention,
                self.fused_conv,
                self.s2b_conv,
                remat_blocks,
                self.dtype,
                upsample="none" if level == n_levels - 1 else resample,
                name=f"up_{level}",
            )(h, level_skips, emb, train)

        assert not skips, "skip bookkeeping mismatch"
        out_ch = self.out_channels if self.out_channels is not None else self.dim[0]
        h = FusedGroupNorm(tail="silu", name="norm_final")(h).astype(self.dtype)
        h = nn.Conv(
            out_ch, (3, 3), padding=1, dtype=self.dtype, kernel_init=nn.initializers.zeros, name="conv_out"
        )(h)
        return h.astype(jnp.float32)


__all__ = ["UNetModel", "ResBlock", "AttentionBlock", "Downsample", "Upsample"]
