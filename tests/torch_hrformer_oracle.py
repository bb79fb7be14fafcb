"""Compact torch HRFormer oracle with reference-identical module naming —
validates the checkpoint importer AND numerical forward parity of the flax
HRFormer (W-MSA + RPE indexing is the silent-failure hotspot: a transposed
bias table survives every self-consistency test).

Written from the documented reference structure (SURVEY.md A6; state-dict
naming per /root/reference/models/hrformer.py:117-846) as a test fixture.
The size knobs (channels/heads/stage_modules) allow a tiny configuration
so the parity test runs in seconds; the state-dict SHAPE is identical to
a real reference checkpoint's.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from infantposeestimation_gaussianbias_tpu.ops.msa import (
    relative_position_index,
)


def _win_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws*ws, C), zero-padded to window multiples."""
    B, H, W, C = x.shape
    ph, pw = (-H) % ws, (-W) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    Hp, Wp = H + ph, W + pw
    x = x.view(B, Hp // ws, ws, Wp // ws, ws, C)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    return x, Hp, Wp


def _win_reverse(wins, ws, H, W, Hp, Wp):
    B = wins.shape[0] // ((Hp // ws) * (Wp // ws))
    x = wins.view(B, Hp // ws, Wp // ws, ws, ws, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class WindowAttention(nn.Module):
    """qkv/proj Linear + (2ws-1)^2 x heads RPE table
    (ref models/hrformer.py:117-200)."""

    def __init__(self, dim, window_size, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.window_size = window_size
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * window_size - 1) ** 2, num_heads))
        self.register_buffer(
            "relative_position_index",
            torch.from_numpy(
                np.ascontiguousarray(relative_position_index(window_size))))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):  # (nW, N, C)
        nW, N, C = x.shape
        h = self.num_heads
        qkv = (self.qkv(x).reshape(nW, N, 3, h, C // h)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.reshape(-1)
        ].reshape(N, N, h).permute(2, 0, 1)
        attn = torch.softmax(attn + bias.unsqueeze(0), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(nW, N, C)
        return self.proj(out)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class HRFormerBlock(nn.Module):
    """norm1 -> windowed attn -> residual; norm2 -> mlp -> residual,
    NCHW in/out (ref models/hrformer.py:203-293; eval mode: DropPath is
    identity so it is omitted — it holds no parameters)."""

    def __init__(self, dim, num_heads, window_size=7, mlp_ratio=4.0):
        super().__init__()
        self.window_size = window_size
        self.norm1 = nn.LayerNorm(dim)
        self.attn = WindowAttention(dim, window_size, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):  # (B, C, H, W)
        B, C, H, W = x.shape
        x = x.permute(0, 2, 3, 1)
        wins, Hp, Wp = _win_partition(self.norm1(x), self.window_size)
        y = _win_reverse(self.attn(wins), self.window_size, H, W, Hp, Wp)
        x = x + y
        x = x + self.mlp(self.norm2(x))
        return x.permute(0, 3, 1, 2)


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


class HRFormerModule(nn.Module):
    """Transformer branches + HRNet-style all-pairs conv fusion
    (ref models/hrformer.py:347-491)."""

    def __init__(self, channels, heads, num_blocks=2, window_size=7):
        super().__init__()
        n = len(channels)
        self.branches = nn.ModuleList([
            nn.Sequential(*[HRFormerBlock(c, h, window_size)
                            for _ in range(num_blocks)])
            for c, h in zip(channels, heads)])
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
                        mods = [nn.Conv2d(channels[j], out_c, 3, 2, 1,
                                          bias=False),
                                nn.BatchNorm2d(out_c)]
                        if not last:
                            mods.append(nn.ReLU(inplace=True))
                        chain.append(nn.Sequential(*mods))
                    row.append(nn.Sequential(*chain))
            fuse.append(row)
        self.fuse_layers = fuse

    def forward(self, xs):
        ys = [br(x) for br, x in zip(self.branches, xs)]
        if len(ys) == 1:
            return ys
        out = []
        for i in range(len(ys)):
            acc = None
            for j in range(len(ys)):
                if j == i:
                    c = ys[j]
                elif j > i:
                    c = F.interpolate(self.fuse_layers[i][j](ys[j]),
                                      size=ys[i].shape[-2:],
                                      mode="bilinear", align_corners=False)
                else:
                    c = self.fuse_layers[i][j](ys[j])
                acc = c if acc is None else acc + c
            out.append(F.relu(acc))
        return out


class TorchHRFormer(nn.Module):
    """Reference-structured HRFormer backbone: conv stem, 2 Bottlenecks,
    transitions, transformer stages; returns the stride-4 branch.

    channels/heads/stage_modules are size knobs; the reference Base is
    channels=(78,156,312,624), heads=(2,4,8,16), stage_modules=(1,4,2).
    """

    def __init__(self, channels=(78, 156, 312, 624), heads=(2, 4, 8, 16),
                 stage_modules=(1, 4, 2), num_blocks=2, window_size=7):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.conv2 = nn.Conv2d(64, 64, 3, 2, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(64)
        down = nn.Sequential(nn.Conv2d(64, 256, 1, bias=False),
                             nn.BatchNorm2d(256))
        self.layer1 = nn.Sequential(Bottleneck(64, 64, down),
                                    Bottleneck(256, 64))

        prev = [256]
        for t, n_br in ((1, 2), (2, 3), (3, 4)):
            cur = list(channels[:n_br])
            trans = nn.ModuleList()
            for i, ch in enumerate(cur):
                if i < len(prev):
                    if prev[i] != ch:
                        trans.append(nn.Sequential(
                            nn.Conv2d(prev[i], ch, 3, 1, 1, bias=False),
                            nn.BatchNorm2d(ch), nn.ReLU(inplace=True)))
                    else:
                        trans.append(nn.Identity())
                else:
                    trans.append(nn.Sequential(nn.Sequential(
                        nn.Conv2d(prev[-1], ch, 3, 2, 1, bias=False),
                        nn.BatchNorm2d(ch), nn.ReLU(inplace=True))))
            setattr(self, f"transition{t}", trans)
            setattr(self, f"stage{t + 1}", nn.Sequential(*[
                HRFormerModule(cur, heads[:n_br], num_blocks, window_size)
                for _ in range(stage_modules[t - 1])]))
            prev = cur

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        ys = [self.layer1(x)]
        for t in (1, 2, 3):
            trans = getattr(self, f"transition{t}")
            xs = []
            for i, tr in enumerate(trans):
                if isinstance(tr, nn.Identity):
                    xs.append(ys[i])
                else:
                    xs.append(tr(ys[i] if i < len(ys) else ys[-1]))
            ys = getattr(self, f"stage{t + 1}")(xs)
        return ys[0]
