"""Canonical torch stacked-hourglass — the conversion oracle.

A faithful PyTorch implementation of the stacked-hourglass lineage that
df2d's ``sh8_deepfly.tar`` checkpoints follow (Newell et al. 1603.06937
via the canonical pytorch-pose layout; reference df3d/config.py:30-32
names the checkpoint, SURVEY §2.2 pins the contract).  Module names
reproduce the canonical state-dict layout exactly:

    conv1, bn1, layer{1..3}.0.*, hg.{s}.hg.{level}.{slot}.0.*,
    res.{s}.0.*, fc.{s}.{0,1}.*, score.{s}, fc_.{s}, score_.{s}

with the level list built INNERMOST-FIRST (hg[0] carries the deepest
level plus the extra innermost residual at slot 3) and the recursion
reading hg[n-1] from the top (n = depth).

Used by tests/test_convert_torch_forward.py: random-init this model,
convert its state dict with models/convert_torch, and assert our Flax
forward reproduces the torch eval-mode forward — computational proof the
converter's conventions (padding, BN eps, nearest upsample, raw-input
skip projection, level ordering) are right, which the structural
round-trip test cannot provide.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    """Pre-activation bottleneck; downsample branch reads the RAW input."""

    def __init__(self, inplanes: int, outplanes: int):
        super().__init__()
        mid = outplanes // 2
        self.bn1 = nn.BatchNorm2d(inplanes)
        self.conv1 = nn.Conv2d(inplanes, mid, kernel_size=1, bias=True)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv2 = nn.Conv2d(mid, mid, kernel_size=3, padding=1, bias=True)
        self.bn3 = nn.BatchNorm2d(mid)
        self.conv3 = nn.Conv2d(mid, outplanes, kernel_size=1, bias=True)
        self.relu = nn.ReLU(inplace=False)
        if inplanes != outplanes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, outplanes, kernel_size=1, bias=True)
            )
        else:
            self.downsample = None

    def forward(self, x):
        residual = x if self.downsample is None else self.downsample(x)
        out = self.conv1(self.relu(self.bn1(x)))
        out = self.conv2(self.relu(self.bn2(out)))
        out = self.conv3(self.relu(self.bn3(out)))
        return out + residual


class Hourglass(nn.Module):
    """Recursive encoder/decoder; hg[0] = innermost level (canonical)."""

    def __init__(self, features: int, depth: int):
        super().__init__()
        self.depth = depth
        hg = []
        for n in range(depth):
            res = [
                nn.Sequential(Bottleneck(features, features)),  # 0: skip
                nn.Sequential(Bottleneck(features, features)),  # 1: down
                nn.Sequential(Bottleneck(features, features)),  # 2: up
            ]
            if n == 0:
                res.append(nn.Sequential(Bottleneck(features, features)))
            hg.append(nn.ModuleList(res))
        self.hg = nn.ModuleList(hg)

    def _forward(self, n, x):
        up1 = self.hg[n - 1][0](x)
        low1 = F.max_pool2d(x, 2, stride=2)
        low1 = self.hg[n - 1][1](low1)
        if n > 1:
            low2 = self._forward(n - 1, low1)
        else:
            low2 = self.hg[0][3](low1)
        low3 = self.hg[n - 1][2](low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="nearest")
        return up1 + up2

    def forward(self, x):
        return self._forward(self.depth, x)


class HourglassNet(nn.Module):
    """Stem + stacked hourglasses with intermediate supervision."""

    def __init__(self, num_stacks: int, features: int, depth: int,
                 num_classes: int):
        super().__init__()
        self.num_stacks = num_stacks
        self.conv1 = nn.Conv2d(3, features // 2, kernel_size=7, stride=2,
                               padding=3, bias=True)
        self.bn1 = nn.BatchNorm2d(features // 2)
        self.relu = nn.ReLU(inplace=False)
        self.layer1 = nn.Sequential(Bottleneck(features // 2, features))
        self.layer2 = nn.Sequential(Bottleneck(features, features))
        self.layer3 = nn.Sequential(Bottleneck(features, features))

        hg, res, fc, score, fc_, score_ = [], [], [], [], [], []
        for s in range(num_stacks):
            hg.append(Hourglass(features, depth))
            res.append(nn.Sequential(Bottleneck(features, features)))
            fc.append(nn.Sequential(
                nn.Conv2d(features, features, kernel_size=1, bias=True),
                nn.BatchNorm2d(features),
                nn.ReLU(inplace=False),
            ))
            score.append(nn.Conv2d(features, num_classes, kernel_size=1,
                                   bias=True))
            if s < num_stacks - 1:
                fc_.append(nn.Conv2d(features, features, kernel_size=1,
                                     bias=True))
                score_.append(nn.Conv2d(num_classes, features, kernel_size=1,
                                        bias=True))
        self.hg = nn.ModuleList(hg)
        self.res = nn.ModuleList(res)
        self.fc = nn.ModuleList(fc)
        self.score = nn.ModuleList(score)
        self.fc_ = nn.ModuleList(fc_)
        self.score_ = nn.ModuleList(score_)

    def forward(self, x):
        x = self.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = F.max_pool2d(x, 2, stride=2)
        x = self.layer2(x)
        x = self.layer3(x)
        out = []
        for s in range(self.num_stacks):
            y = self.hg[s](x)
            y = self.res[s](y)
            y = self.fc[s](y)
            sc = self.score[s](y)
            out.append(sc)
            if s < self.num_stacks - 1:
                x = x + self.fc_[s](y) + self.score_[s](sc)
        return out


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Non-degenerate random weights incl. BN running stats (eval mode
    must exercise them: mean 0 / var 1 would hide scale/shift mix-ups)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.normal_(0.0, 0.2, generator=g)
                if m.bias is not None:
                    m.bias.normal_(0.0, 0.1, generator=g)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.normal_(1.0, 0.1, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.1, generator=g)
                m.running_var.uniform_(0.7, 1.4, generator=g)
