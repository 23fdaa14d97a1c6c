"""Minimal torch implementation of the reference's multitask modules, used as
a conversion oracle (state-dict layout of
/root/reference/src/models/components/shared_encoder.py and
task_decoders.py — written fresh from the documented structure, not copied).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class DoubleConv(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.double_conv = nn.Sequential(
            nn.Conv2d(in_ch, out_ch, 3, padding=1),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(inplace=True),
            nn.Conv2d(out_ch, out_ch, 3, padding=1),
            nn.BatchNorm2d(out_ch),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        return self.double_conv(x)


class Down(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.maxpool_conv = nn.Sequential(nn.MaxPool2d(2), DoubleConv(in_ch, out_ch))

    def forward(self, x):
        return self.maxpool_conv(x)


class SharedEncoder(nn.Module):
    def __init__(self, in_channels: int = 3, features=(64, 128, 256, 512, 1024)):
        super().__init__()
        self.inc = DoubleConv(in_channels, features[0])
        self.downs = nn.ModuleList(
            [Down(features[i], features[i + 1]) for i in range(len(features) - 1)]
        )

    def forward(self, x):
        skips = []
        x = self.inc(x)
        skips.append(x)
        for down in self.downs:
            x = down(x)
            skips.append(x)
        return skips[-1], skips[:-1][::-1]


class Up(nn.Module):
    def __init__(self, in_ch: int, out_ch: int):
        super().__init__()
        self.up = nn.Upsample(scale_factor=2, mode="bilinear", align_corners=True)
        self.conv = DoubleConv(in_ch, out_ch)

    def forward(self, x1, x2):
        x1 = self.up(x1)
        dy, dx = x2.size(2) - x1.size(2), x2.size(3) - x1.size(3)
        x1 = F.pad(x1, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        return self.conv(torch.cat([x2, x1], dim=1))


class FlowMatchingDecoder(nn.Module):
    def __init__(self, bottleneck_channels=1024, features=(512, 256, 128, 64),
                 out_channels=3, time_emb_dim=256):
        super().__init__()
        self.time_mlp = nn.Sequential(
            nn.Linear(time_emb_dim, time_emb_dim),
            nn.SiLU(),
            nn.Linear(time_emb_dim, time_emb_dim),
        )
        self.time_proj = nn.Linear(time_emb_dim, bottleneck_channels)
        self.ups = nn.ModuleList()
        in_ch = bottleneck_channels
        for feat in features:
            self.ups.append(Up(in_ch + feat, feat))
            in_ch = feat
        self.outc = nn.Conv2d(features[-1], out_channels, 1)

    def forward(self, bottleneck, skips, t_emb):
        t = self.time_proj(self.time_mlp(t_emb))
        x = bottleneck + t[:, :, None, None]
        for up, skip in zip(self.ups, skips):
            x = up(x, skip)
        return self.outc(x)


class SegmentationDecoder(nn.Module):
    def __init__(self, bottleneck_channels=1024, features=(512, 256, 128, 64),
                 out_channels=1):
        super().__init__()
        self.ups = nn.ModuleList()
        in_ch = bottleneck_channels
        for feat in features:
            self.ups.append(Up(in_ch + feat, feat))
            in_ch = feat
        self.outc = nn.Conv2d(features[-1], out_channels, 1)

    def forward(self, bottleneck, skips):
        x = bottleneck
        for up, skip in zip(self.ups, skips):
            x = up(x, skip)
        return self.outc(x)


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give every BatchNorm non-trivial running stats so a mean/var swap in
    the converter cannot pass the parity test."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean = torch.randn(m.running_mean.shape, generator=g) * 0.2
            m.running_var = torch.rand(m.running_var.shape, generator=g) + 0.5
