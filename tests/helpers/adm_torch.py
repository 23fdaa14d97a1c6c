"""Minimal torch implementation of the ADM UNet, used as a conversion oracle.

Implements the published guided-diffusion architecture (Dhariwal & Nichol
2021) with torch modules arranged so ``state_dict()`` reproduces the exact
key layout of ``torchcfm.models.unet.UNetModel`` (the reference's velocity
net, cfg /root/reference/configs/model/conditional_flow_matching.yaml:16-26;
the package itself is not installed in this image). Tests randomly initialize
this oracle, convert its state dict with
:mod:`stain2stain_tpu.compat.torch_unet`, and assert numeric parity against
the flax :class:`stain2stain_tpu.models.UNetModel` — validating name walk,
layout transposes, and the legacy qkv head-interleaving in one shot.

Written from the published design; first-party code (guided-diffusion is not
in /root/reference either — it lives in the external torchcfm package).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def _gn_groups(channels: int) -> int:
    groups = min(32, channels)
    while channels % groups:
        groups -= 1
    return groups


def timestep_embedding(t: torch.Tensor, dim: int, max_period: float = 10000.0) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    if dim % 2:
        emb = torch.cat([emb, torch.zeros_like(emb[:, :1])], dim=-1)
    return emb


class ResBlock(nn.Module):
    def __init__(self, ch: int, emb_ch: int, out_ch: int, use_scale_shift_norm: bool = True):
        super().__init__()
        self.use_scale_shift_norm = use_scale_shift_norm
        self.in_layers = nn.Sequential(
            nn.GroupNorm(_gn_groups(ch), ch),
            nn.SiLU(),
            nn.Conv2d(ch, out_ch, 3, padding=1),
        )
        self.emb_layers = nn.Sequential(
            nn.SiLU(),
            nn.Linear(emb_ch, 2 * out_ch if use_scale_shift_norm else out_ch),
        )
        self.out_layers = nn.Sequential(
            nn.GroupNorm(_gn_groups(out_ch), out_ch),
            nn.SiLU(),
            nn.Dropout(0.0),
            nn.Conv2d(out_ch, out_ch, 3, padding=1),
        )
        self.skip_connection = (
            nn.Conv2d(ch, out_ch, 1) if ch != out_ch else nn.Identity()
        )

    def forward(self, x: torch.Tensor, emb: torch.Tensor) -> torch.Tensor:
        h = self.in_layers(x)
        emb_out = self.emb_layers(emb)[:, :, None, None]
        if self.use_scale_shift_norm:
            scale, shift = torch.chunk(emb_out, 2, dim=1)
            h = self.out_layers[0](h) * (1 + scale) + shift
            h = self.out_layers[1:](h)
        else:
            h = self.out_layers(h + emb_out)
        return self.skip_connection(x) + h


class AttentionBlock(nn.Module):
    """Legacy qkv order: reshape to (B·H, 3d, T) before the q/k/v split."""

    def __init__(self, ch: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.norm = nn.GroupNorm(_gn_groups(ch), ch)
        self.qkv = nn.Conv1d(ch, 3 * ch, 1)
        self.proj_out = nn.Conv1d(ch, ch, 1)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        b, c, height, width = x.shape
        flat = x.reshape(b, c, height * width)
        qkv = self.qkv(self.norm(flat))  # (B, 3C, T)
        bs, _, length = qkv.shape
        d = c // self.num_heads
        q, k, v = qkv.reshape(bs * self.num_heads, 3 * d, length).split(d, dim=1)
        scale = 1 / math.sqrt(math.sqrt(d))
        weight = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        weight = torch.softmax(weight.float(), dim=-1).type(weight.dtype)
        a = torch.einsum("bts,bcs->bct", weight, v).reshape(bs, c, length)
        return (flat + self.proj_out(a)).reshape(b, c, height, width)


class Downsample(nn.Module):
    def __init__(self, ch: int, use_conv: bool):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1) if use_conv else nn.AvgPool2d(2)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return self.op(x)


class Upsample(nn.Module):
    def __init__(self, ch: int, use_conv: bool):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1) if use_conv else None

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        return self.conv(x) if self.conv is not None else x


class ADMUNet(nn.Module):
    """NCHW ADM UNet with torchcfm's state-dict key layout."""

    def __init__(
        self,
        image_size: int,
        in_channels: int = 3,
        num_channels: int = 32,
        num_res_blocks: int = 1,
        channel_mult=(1, 2),
        attention_resolutions="8",
        num_heads: int = 4,
        num_head_channels: int = -1,
        class_cond: bool = False,
        num_classes=None,
        out_channels=None,
        use_scale_shift_norm: bool = True,
    ):
        super().__init__()
        mc = num_channels
        emb_ch = 4 * mc
        if isinstance(attention_resolutions, str):
            attn_ds = tuple(
                image_size // int(r) for r in attention_resolutions.split(",") if r.strip()
            )
        else:
            attn_ds = tuple(attention_resolutions)

        def heads_for(ch: int) -> int:
            if num_head_channels != -1:
                return max(ch // num_head_channels, 1)
            return num_heads

        self.time_embed = nn.Sequential(
            nn.Linear(mc, emb_ch), nn.SiLU(), nn.Linear(emb_ch, emb_ch)
        )
        if class_cond:
            self.label_emb = nn.Embedding(num_classes, emb_ch)
        self.num_channels = mc

        self.input_blocks = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(in_channels, mc, 3, padding=1)])]
        )
        ch, ds = mc, 1
        level_cfg = []
        n_levels = len(channel_mult)
        for level, mult in enumerate(channel_mult):
            out_ch = mult * mc
            heads = heads_for(out_ch) if ds in attn_ds else 0
            level_cfg.append((level, out_ch, heads))
            for _ in range(num_res_blocks):
                mods = [ResBlock(ch, emb_ch, out_ch, use_scale_shift_norm)]
                ch = out_ch
                if heads:
                    mods.append(AttentionBlock(ch, heads))
                self.input_blocks.append(nn.ModuleList(mods))
            if level != n_levels - 1:
                self.input_blocks.append(nn.ModuleList([Downsample(ch, True)]))
                ds *= 2

        self.middle_block = nn.ModuleList(
            [
                ResBlock(ch, emb_ch, ch, use_scale_shift_norm),
                AttentionBlock(ch, heads_for(ch)),
                ResBlock(ch, emb_ch, ch, use_scale_shift_norm),
            ]
        )

        self.output_blocks = nn.ModuleList()
        skip_chs = []  # parallel reconstruction of the skip channel stack
        c = mc
        skip_chs.append(c)
        for level, out_ch, heads in level_cfg:
            for _ in range(num_res_blocks):
                skip_chs.append(out_ch)
            if level != n_levels - 1:
                skip_chs.append(out_ch)
        for level, out_ch, heads in reversed(level_cfg):
            for i in range(num_res_blocks + 1):
                mods = [ResBlock(ch + skip_chs.pop(), emb_ch, out_ch, use_scale_shift_norm)]
                ch = out_ch
                if heads:
                    mods.append(AttentionBlock(ch, heads))
                if i == num_res_blocks and level != 0:
                    mods.append(Upsample(ch, True))
                self.output_blocks.append(nn.ModuleList(mods))

        self.out = nn.Sequential(
            nn.GroupNorm(_gn_groups(ch), ch),
            nn.SiLU(),
            nn.Conv2d(ch, out_channels or in_channels, 3, padding=1),
        )

    def forward(self, t: torch.Tensor, x: torch.Tensor, y=None) -> torch.Tensor:
        emb = self.time_embed(timestep_embedding(t, self.num_channels))
        if y is not None:
            emb = emb + self.label_emb(y)
        h = x
        hs = []
        for block in self.input_blocks:
            for m in block:
                h = m(h, emb) if isinstance(m, ResBlock) else m(h)
            hs.append(h)
        for m in self.middle_block:
            h = m(h, emb) if isinstance(m, ResBlock) else m(h)
        for block in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            for m in block:
                h = m(h, emb) if isinstance(m, ResBlock) else m(h)
        return self.out(h)
