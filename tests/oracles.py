"""Loop-based numpy/cv2 oracle implementations of the reference semantics.

These deliberately mirror the reference's per-sample/per-keypoint loop
structure (documented in SURVEY.md section 3) so the vectorized device ops
can be checked against an independent, readable implementation.
"""

import cv2
import numpy as np


def get_affine_transform_oracle(center, scale, output_size, rot=0.0):
    """3-point cv2.getAffineTransform construction (MMPose convention)."""
    src_w = scale[0]
    dst_w, dst_h = output_size

    rot_rad = np.pi * rot / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_dir = np.array([0 * cs - (-0.5 * src_w) * sn,
                        0 * sn + (-0.5 * src_w) * cs])
    dst_dir = np.array([0.0, dst_w * -0.5])

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]])

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    src[2] = third(src[0], src[1])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = third(dst[0], dst[1])
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def generate_target_oracle(keypoints, visible, heatmap_size, input_size, sigma):
    """MSRA clipped-Gaussian target generation, per-keypoint loop."""
    W, H = heatmap_size
    K = keypoints.shape[0]
    target = np.zeros((K, H, W), np.float32)
    weight = np.zeros((K,), np.float32)
    stride = np.array(input_size, np.float64) / np.array(heatmap_size, np.float64)
    tmp = sigma * 3

    for j in range(K):
        weight[j] = visible[j]
        if weight[j] < 0.5:
            continue
        mu_x = keypoints[j, 0] / stride[0]
        mu_y = keypoints[j, 1] / stride[1]
        ul = [int(mu_x - tmp), int(mu_y - tmp)]
        br = [int(mu_x + tmp + 1), int(mu_y + tmp + 1)]
        if ul[0] >= W or ul[1] >= H or br[0] < 0 or br[1] < 0:
            weight[j] = 0
            continue
        size = 2 * tmp + 1
        x = np.arange(0, size, 1, np.float32)
        y = x[:, None]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
        g_x = max(0, -ul[0]), min(br[0], W) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], H) - ul[1]
        img_x = max(0, ul[0]), min(br[0], W)
        img_y = max(0, ul[1]), min(br[1], H)
        target[j][img_y[0]:img_y[1], img_x[0]:img_x[1]] = \
            g[int(g_y[0]):int(g_y[1]), int(g_x[0]):int(g_x[1])]
    return target, weight


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def quarter_shift_oracle(heatmaps):
    """heatmaps: (B, K, H, W); returns coords (B,K,2), maxvals (B,K)."""
    B, K, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, K, -1)
    idx = flat.argmax(-1)
    maxvals = flat.max(-1)
    coords = np.stack([(idx % W).astype(np.float32),
                       (idx // W).astype(np.float32)], -1)
    for b in range(B):
        for k in range(K):
            x, y = int(coords[b, k, 0]), int(coords[b, k, 1])
            if 0 < x < W - 1 and 0 < y < H - 1:
                dx = heatmaps[b, k, y, x + 1] - heatmaps[b, k, y, x - 1]
                dy = heatmaps[b, k, y + 1, x] - heatmaps[b, k, y - 1, x]
                coords[b, k, 0] += np.sign(dx) * 0.25
                coords[b, k, 1] += np.sign(dy) * 0.25
    return coords, maxvals


def taylor_oracle(heatmaps):
    B, K, H, W = heatmaps.shape
    flat = heatmaps.reshape(B, K, -1)
    idx = flat.argmax(-1)
    maxvals = flat.max(-1)
    coords = np.stack([(idx % W).astype(np.float32),
                       (idx // W).astype(np.float32)], -1)
    for b in range(B):
        for k in range(K):
            hm = heatmaps[b, k]
            px, py = int(coords[b, k, 0]), int(coords[b, k, 1])
            if 1 < px < W - 1 and 1 < py < H - 1:
                dx = hm[py, px + 1] - hm[py, px - 1]
                dy = hm[py + 1, px] - hm[py - 1, px]
                dxx = hm[py, px + 1] - 2 * hm[py, px] + hm[py, px - 1]
                dyy = hm[py + 1, px] - 2 * hm[py, px] + hm[py - 1, px]
                if dxx < 0:
                    coords[b, k, 0] += np.clip(dx / (2 * abs(dxx)), -0.5, 0.5)
                if dyy < 0:
                    coords[b, k, 1] += np.clip(dy / (2 * abs(dyy)), -0.5, 0.5)
    return coords, maxvals


def soft_argmax_oracle(heatmaps, beta=1.0):
    B, K, H, W = heatmaps.shape
    p = softmax((heatmaps * beta).reshape(B, K, -1), -1).reshape(B, K, H, W)
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    x = (p * gx[None, None]).sum((-1, -2))
    y = (p * gy[None, None]).sum((-1, -2))
    scores = heatmaps.reshape(B, K, -1).max(-1)
    return np.stack([x, y], -1), scores


def local_refine_oracle(heatmaps, coarse, r=2):
    B, K, H, W = heatmaps.shape
    out = coarse.copy()
    for b in range(B):
        for k in range(K):
            # numpy round = banker's rounding, same as torch round
            px = int(np.clip(np.round(coarse[b, k, 0]), 0, W - 1))
            py = int(np.clip(np.round(coarse[b, k, 1]), 0, H - 1))
            x_min, x_max = max(0, px - r), min(W, px + r + 1)
            y_min, y_max = max(0, py - r), min(H, py + r + 1)
            patch = heatmaps[b, k, y_min:y_max, x_min:x_max]
            ly, lx = np.meshgrid(np.arange(y_min, y_max),
                                 np.arange(x_min, x_max), indexing="ij")
            w = softmax(patch.flatten()).reshape(patch.shape)
            out[b, k, 0] = (w * lx).sum()
            out[b, k, 1] = (w * ly).sum()
    return out


def grid_sample_point_oracle(maps, coords):
    """maps: (B, K, C, H, W); coords (B, K, 2) pixel coords.
    Bilinear, border padding, align_corners=True semantics."""
    B, K, C, H, W = maps.shape
    out = np.zeros((B, K, C), np.float32)
    for b in range(B):
        for k in range(K):
            x = np.clip(coords[b, k, 0], 0, W - 1)
            y = np.clip(coords[b, k, 1], 0, H - 1)
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            x1, y1 = min(x0 + 1, W - 1), min(y0 + 1, H - 1)
            fx, fy = x - x0, y - y0
            v = (maps[b, k, :, y0, x0] * (1 - fx) * (1 - fy) +
                 maps[b, k, :, y0, x1] * fx * (1 - fy) +
                 maps[b, k, :, y1, x0] * (1 - fx) * fy +
                 maps[b, k, :, y1, x1] * fx * fy)
            out[b, k] = v
    return out
