"""Compact torch HRNet + fusion-head oracle with reference-identical
module naming — used to validate the checkpoint importer AND numerical
forward parity of the flax models.

Written from the documented reference structure (SURVEY.md A5/A7;
state-dict naming per /root/reference/models/hrnet.py and
fusion_head.py) as a test fixture.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class BasicBlock(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + x)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, in_ch, ch, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, ch, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        self.conv3 = nn.Conv2d(ch, ch * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(ch * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = F.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return F.relu(y + r)


class HRModule(nn.Module):
    def __init__(self, channels, num_blocks=4):
        super().__init__()
        n = len(channels)
        self.branches = nn.ModuleList([
            nn.Sequential(*[BasicBlock(c) for _ in range(num_blocks)])
            for c in channels])
        fuse = nn.ModuleList()
        for i in range(n):
            row = nn.ModuleList()
            for j in range(n):
                if j > i:
                    row.append(nn.Sequential(
                        nn.Conv2d(channels[j], channels[i], 1, bias=False),
                        nn.BatchNorm2d(channels[i])))
                elif j == i:
                    row.append(nn.Identity())
                else:
                    chain = []
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_c = channels[i] if last else channels[j]
                        mods = [nn.Conv2d(channels[j] if k == 0 else
                                          channels[j], out_c, 3, 2, 1,
                                          bias=False),
                                nn.BatchNorm2d(out_c)]
                        if not last:
                            mods.append(nn.ReLU(inplace=True))
                        chain.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*chain))
            fuse.append(row)
        self.fuse_layers = fuse

    def forward(self, xs):
        ys = [b(x) for b, x in zip(self.branches, xs)]
        out = []
        for i, row in enumerate(self.fuse_layers):
            acc = None
            for j, layer in enumerate(row):
                if j == i:
                    c = ys[j]
                elif j > i:
                    c = F.interpolate(layer(ys[j]), size=ys[i].shape[-2:],
                                      mode="bilinear", align_corners=False)
                else:
                    c = layer(ys[j])
                acc = c if acc is None else acc + c
            out.append(F.relu(acc))
        return out


class TorchHRNet(nn.Module):
    """Reference-structured HRNet with reference state_dict naming."""

    def __init__(self, base=32):
        super().__init__()
        C = base
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        ds = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False),
                           nn.BatchNorm2d(256))
        self.layer1 = nn.Sequential(
            Bottleneck(64, 64, ds), Bottleneck(256, 64),
            Bottleneck(256, 64), Bottleneck(256, 64))

        def trans_existing(in_c, out_c):
            return nn.Sequential(nn.Conv2d(in_c, out_c, 3, 1, 1, bias=False),
                                 nn.BatchNorm2d(out_c), nn.ReLU(True))

        def trans_new(in_c, out_c):
            return nn.Sequential(nn.Sequential(
                nn.Conv2d(in_c, out_c, 3, 2, 1, bias=False),
                nn.BatchNorm2d(out_c), nn.ReLU(True)))

        chans = [(C, 2 * C), (C, 2 * C, 4 * C), (C, 2 * C, 4 * C, 8 * C)]
        self.transition1 = nn.ModuleList(
            [trans_existing(256, C), trans_new(256, 2 * C)])
        self.stage2 = nn.Sequential(HRModule(chans[0]))
        self.transition2 = nn.ModuleList(
            [nn.Identity(), nn.Identity(), trans_new(2 * C, 4 * C)])
        self.stage3 = nn.Sequential(*[HRModule(chans[1]) for _ in range(4)])
        self.transition3 = nn.ModuleList(
            [nn.Identity(), nn.Identity(), nn.Identity(),
             trans_new(4 * C, 8 * C)])
        self.stage4 = nn.Sequential(*[HRModule(chans[2]) for _ in range(3)])

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = self.layer1(x)
        xs = [self.transition1[0](x), self.transition1[1](x)]
        xs = self.stage2(xs)
        xs = [xs[0], xs[1], self.transition2[2](xs[-1])]
        xs = self.stage3(xs)
        xs = [xs[0], xs[1], xs[2], self.transition3[3](xs[-1])]
        xs = self.stage4(xs)
        return xs[0]


class TorchFusionHead(nn.Module):
    """Reference HeatmapRegressionHead structure/naming
    (fusion_head.py:195-307)."""

    def __init__(self, in_ch=32, K=17, hidden=256):
        super().__init__()
        self.shared_layers = nn.Sequential(
            nn.Conv2d(in_ch, hidden, 3, 1, 1, bias=False),
            nn.BatchNorm2d(hidden), nn.ReLU(True),
            nn.Conv2d(hidden, hidden, 3, 1, 1, bias=False),
            nn.BatchNorm2d(hidden), nn.ReLU(True))
        self.heatmap_branch = nn.Sequential(
            nn.Conv2d(hidden, hidden, 3, 1, 1, bias=False),
            nn.BatchNorm2d(hidden), nn.ReLU(True),
            nn.Conv2d(hidden, K, 1))
        self.offset_branch = nn.Sequential(
            nn.Conv2d(hidden, hidden, 3, 1, 1, bias=False),
            nn.BatchNorm2d(hidden), nn.ReLU(True),
            nn.Conv2d(hidden, K * 2, 1))
        self.variance_branch = nn.Sequential(
            nn.Conv2d(hidden, hidden // 2, 3, 1, 1, bias=False),
            nn.BatchNorm2d(hidden // 2), nn.ReLU(True),
            nn.Conv2d(hidden // 2, K, 1), nn.Softplus())

        class _Refine(nn.Module):
            def __init__(self):
                super().__init__()
                self.alpha = nn.Parameter(torch.tensor(0.5))

        self.subpixel_refine = _Refine()
        self.fusion_weight = nn.Parameter(torch.tensor(0.5))

    def forward(self, x):
        f = self.shared_layers(x)
        K = self.heatmap_branch[-1].out_channels
        hm = self.heatmap_branch(f)
        off = self.offset_branch(f)
        B, _, H, W = off.shape
        return {
            "heatmaps": hm,
            "offsets": off.view(B, K, 2, H, W),
            "variances": self.variance_branch(f),
        }
