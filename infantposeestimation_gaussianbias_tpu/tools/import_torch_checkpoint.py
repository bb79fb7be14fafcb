"""Import reference PyTorch checkpoints into this framework's param tree.

A user of the reference trains with /root/reference/train.py and saves
{'model_state_dict': ...} (train.py:339-368).  This tool maps that
state_dict (the reference's own module naming, /root/reference/models/
hrnet.py + fusion_head.py + pose_estimator.py) onto our flax parameter /
batch_stats pytrees so trained models transfer without retraining:

  torch conv weight (O, I, kh, kw)  ->  flax kernel (kh, kw, I, O)
  torch linear weight (O, I)        ->  flax kernel (I, O)
  BN weight/bias/running_mean/var   ->  scale/bias + batch_stats mean/var

Supported: HRNet-W32/W48 backbone, HeatmapHead (deconv-free), FusionHead.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0)}


def _bn(sd, name) -> Tuple[Dict, Dict]:
    params = {"scale": np.asarray(sd[f"{name}.weight"]),
              "bias": np.asarray(sd[f"{name}.bias"])}
    stats = {"mean": np.asarray(sd[f"{name}.running_mean"]),
             "var": np.asarray(sd[f"{name}.running_var"])}
    return params, stats


def _convnorm(sd, conv_name, bn_name):
    """-> our ConvNorm {conv: {kernel}, norm: {bn: {...}}} pair."""
    p_bn, s_bn = _bn(sd, bn_name)
    params = {"conv": _conv(sd, conv_name), "norm": {"bn": p_bn}}
    stats = {"norm": {"bn": s_bn}}
    return params, stats


def _merge(dst: Dict, src: Dict) -> None:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _set(tree: Dict, path: str, params: Dict, stats_tree: Dict,
         stats: Dict) -> None:
    node = tree
    snode = stats_tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        snode = snode.setdefault(p, {})
    _merge(node.setdefault(parts[-1], {}), params)
    if stats:
        _merge(snode.setdefault(parts[-1], {}), stats)


def convert_hrnet_backbone(sd: Dict, prefix: str = "backbone."
                           ) -> Tuple[Dict, Dict]:
    """Reference HRNet state_dict -> our HRNet params/batch_stats trees."""
    P: Dict = {}
    S: Dict = {}

    def put(path, conv_name, bn_name):
        p, s = _convnorm(sd, prefix + conv_name, prefix + bn_name)
        _set(P, path, p, S, s)

    # stem (ref hrnet.py:252-257)
    put("stem1", "conv1", "bn1")
    put("stem2", "conv2", "bn2")

    # layer1: 4 Bottlenecks (conv1/2/3 + optional downsample)
    for b in range(4):
        base = f"layer1.{b}"
        for i in (1, 2, 3):
            put(f"layer1_block{b}/conv{i}", f"{base}.conv{i}",
                f"{base}.bn{i}")
        if f"{prefix}{base}.downsample.0.weight" in sd:
            put(f"layer1_block{b}/downsample", f"{base}.downsample.0",
                f"{base}.downsample.1")

    # transitions: existing-branch convs are Sequential(conv,bn,relu);
    # new-branch entries wrap one such Sequential (ref hrnet.py:330-360).
    n_branches = [1, 2, 3, 4]
    for t in (1, 2, 3):
        for i in range(n_branches[t]):
            flat = f"transition{t}.{i}.0"
            nested = f"transition{t}.{i}.0.0"
            if f"{prefix}{nested}.weight" in sd:  # new lowest branch
                put(f"transition{t}_{i}", nested, f"transition{t}.{i}.0.1")
            elif f"{prefix}{flat}.weight" in sd:  # channel-changing conv
                put(f"transition{t}_{i}", flat, f"transition{t}.{i}.1")
            # else: identity transition (None in the reference)

    # stages (modules per stage: 1, 4, 3; 4 BasicBlocks per branch)
    stage_modules = {2: 1, 3: 4, 4: 3}
    for s_idx, modules in stage_modules.items():
        nb = s_idx  # stage2 -> 2 branches, etc.
        for m in range(modules):
            mbase = f"stage{s_idx}.{m}"
            for br in range(nb):
                for blk in range(4):
                    bb = f"{mbase}.branches.{br}.{blk}"
                    put(f"stage{s_idx}_module{m}/branch{br}_block{blk}/conv1",
                        f"{bb}.conv1", f"{bb}.bn1")
                    put(f"stage{s_idx}_module{m}/branch{br}_block{blk}/conv2",
                        f"{bb}.conv2", f"{bb}.bn2")
            for i in range(nb):
                for j in range(nb):
                    if j == i:
                        continue
                    fl = f"{mbase}.fuse_layers.{i}.{j}"
                    if j > i:  # Sequential(conv1x1, bn)
                        put(f"stage{s_idx}_module{m}/fuse{i}_{j}",
                            f"{fl}.0", f"{fl}.1")
                    else:  # chain of Sequential(conv,bn[,relu])
                        for k in range(i - j):
                            put(f"stage{s_idx}_module{m}/fuse{i}_{j}_{k}",
                                f"{fl}.{k}.0", f"{fl}.{k}.1")
    return P, S


def _dense(sd, name):
    """torch Linear -> flax Dense {kernel (I,O), bias}."""
    w = np.asarray(sd[f"{name}.weight"])
    out = {"kernel": w.transpose(1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _ln(sd, name):
    """torch LayerNorm -> flax {scale, bias}."""
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def convert_hrformer_backbone(sd: Dict, prefix: str = "backbone."
                              ) -> Tuple[Dict, Dict]:
    """Reference HRFormer state_dict -> our HRFormer params/batch_stats.

    Mapping (ref models/hrformer.py:494-846 naming -> models/hrformer.py):
      conv1/bn1, conv2/bn2            -> stem1, stem2
      layer1.{b}.conv{i}/bn{i}        -> layer1_block{b}/conv{i} (+downsample)
      transition{t}.{i}[.0].{0,1}     -> transition{t}_{i}
      stage{s}.{m}.branches.{br}.{bl} -> stage{s}_module{m}/branch{br}_block{bl}
        .norm1|norm2 (LayerNorm)      ->   norm1|norm2 {scale,bias}
        .attn.qkv|proj (Linear)       ->   attn/{qkv,proj} {kernel,bias}
        .attn.relative_position_bias_table -> attn/rpe_table (same
          ((2w-1)^2, heads) layout; the (N,N) index is rebuilt statically
          on our side with the identical construction, ops/msa.py)
        .mlp.fc1|fc2 (Linear)         ->   mlp/{fc1,fc2}
      stage{s}.{m}.fuse_layers.{i}.{j}-> stage{s}_module{m}/fuse{i}_{j}[_{k}]

    Stage/module/block counts are discovered from the state_dict keys, so
    base (modules 1,4,2) and small checkpoints both convert.
    """
    P: Dict = {}
    S: Dict = {}

    def put(path, conv_name, bn_name):
        p, s = _convnorm(sd, prefix + conv_name, prefix + bn_name)
        _set(P, path, p, S, s)

    put("stem1", "conv1", "bn1")
    put("stem2", "conv2", "bn2")

    # layer1: Bottlenecks (ref stage1_num_blocks=(2,))
    b = 0
    while f"{prefix}layer1.{b}.conv1.weight" in sd:
        base = f"layer1.{b}"
        for i in (1, 2, 3):
            put(f"layer1_block{b}/conv{i}", f"{base}.conv{i}",
                f"{base}.bn{i}")
        if f"{prefix}{base}.downsample.0.weight" in sd:
            put(f"layer1_block{b}/downsample", f"{base}.downsample.0",
                f"{base}.downsample.1")
        b += 1

    for t in (1, 2, 3):
        for i in range(t + 1):
            flat = f"transition{t}.{i}.0"
            nested = f"transition{t}.{i}.0.0"
            if f"{prefix}{nested}.weight" in sd:  # new lowest branch
                put(f"transition{t}_{i}", nested, f"transition{t}.{i}.0.1")
            elif f"{prefix}{flat}.weight" in sd:  # channel-changing conv
                put(f"transition{t}_{i}", flat, f"transition{t}.{i}.1")
            # else: identity transition

    for s_idx in (2, 3, 4):
        nb = s_idx  # branches per stage
        m = 0
        while f"{prefix}stage{s_idx}.{m}.branches.0.0.norm1.weight" in sd:
            mbase = f"stage{s_idx}.{m}"
            mpath = f"stage{s_idx}_module{m}"
            for br in range(nb):
                blk = 0
                while (f"{prefix}{mbase}.branches.{br}.{blk}.norm1.weight"
                       in sd):
                    bb = f"{prefix}{mbase}.branches.{br}.{blk}"
                    bp = f"{mpath}/branch{br}_block{blk}"
                    block = {
                        "norm1": _ln(sd, f"{bb}.norm1"),
                        "norm2": _ln(sd, f"{bb}.norm2"),
                        "attn": {
                            "qkv": _dense(sd, f"{bb}.attn.qkv"),
                            "proj": _dense(sd, f"{bb}.attn.proj"),
                            "rpe_table": np.asarray(
                                sd[f"{bb}.attn."
                                   f"relative_position_bias_table"]),
                        },
                        "mlp": {
                            "fc1": _dense(sd, f"{bb}.mlp.fc1"),
                            "fc2": _dense(sd, f"{bb}.mlp.fc2"),
                        },
                    }
                    _set(P, bp, block, S, {})
                    blk += 1
            for i in range(nb):
                for j in range(nb):
                    if j == i:
                        continue
                    fl = f"{mbase}.fuse_layers.{i}.{j}"
                    if j > i:  # Sequential(conv1x1, bn)
                        put(f"{mpath}/fuse{i}_{j}", f"{fl}.0", f"{fl}.1")
                    else:  # chain of Sequential(conv,bn[,relu])
                        for k in range(i - j):
                            put(f"{mpath}/fuse{i}_{j}_{k}",
                                f"{fl}.{k}.0", f"{fl}.{k}.1")
            m += 1
    return P, S


def convert_heatmap_head(sd: Dict, prefix: str = "head.") -> Tuple[Dict, Dict]:
    """Reference HeatmapHead (no deconvs) -> our HeatmapHead tree."""
    w = np.asarray(sd[f"{prefix}final_layer.weight"])
    P = {"final": {"kernel": w.transpose(2, 3, 1, 0),
                   "bias": np.asarray(sd[f"{prefix}final_layer.bias"])}}
    return P, {}


def convert_fusion_head(sd: Dict, prefix: str = "head.") -> Tuple[Dict, Dict]:
    """Reference HeatmapRegressionHead -> our FusionHead tree
    (ref fusion_head.py:195-307: shared_layers conv idx 0/3 bn idx 1/4;
    branches conv idx 0 bn idx 1 + final conv idx 3)."""
    P: Dict = {}
    S: Dict = {}

    def put(path, conv_name, bn_name):
        p, s = _convnorm(sd, prefix + conv_name, prefix + bn_name)
        _set(P, path, p, S, s)

    def put_final(path, name):
        w = np.asarray(sd[f"{prefix}{name}.weight"])
        _set(P, path, {"kernel": w.transpose(2, 3, 1, 0),
                       "bias": np.asarray(sd[f"{prefix}{name}.bias"])},
             S, {})

    put("shared0", "shared_layers.0", "shared_layers.1")
    put("shared1", "shared_layers.3", "shared_layers.4")
    put("hm_conv", "heatmap_branch.0", "heatmap_branch.1")
    put_final("hm_final", "heatmap_branch.3")
    put("off_conv", "offset_branch.0", "offset_branch.1")
    put_final("off_final", "offset_branch.3")
    put("var_conv", "variance_branch.0", "variance_branch.1")
    put_final("var_final", "variance_branch.3")
    P["fusion_weight"] = np.asarray(sd[f"{prefix}fusion_weight"])
    P["subpixel_alpha"] = np.asarray(
        sd[f"{prefix}subpixel_refine.alpha"])
    return P, S


def detect_backbone_family(sd: Dict, prefix: str = "backbone.") -> str:
    """'hrformer' when transformer-branch keys exist, else 'hrnet'."""
    probe = f"{prefix}stage2.0.branches.0.0.norm1.weight"
    return "hrformer" if probe in sd else "hrnet"


def convert_checkpoint(state_dict: Dict, head_type: str = "fusion"
                       ) -> Tuple[Dict, Dict]:
    """Full reference PoseEstimator state_dict -> (params, batch_stats).

    Returns trees matching PoseEstimator's variables: params['backbone'],
    params['head'].  The backbone family (HRNet vs HRFormer) is detected
    from the state_dict keys.
    """
    sd = {k: v for k, v in state_dict.items()}
    if detect_backbone_family(sd) == "hrformer":
        bp, bs = convert_hrformer_backbone(sd)
    else:
        bp, bs = convert_hrnet_backbone(sd)
    if head_type == "fusion":
        hp, hs = convert_fusion_head(sd)
    else:
        hp, hs = convert_heatmap_head(sd)
    params = {"backbone": bp, "head": hp}
    stats = {"backbone": bs}
    if hs:
        stats["head"] = hs
    return params, stats


def load_into_state(state, ckpt_path: str, head_type: str = "fusion"):
    """Load a reference .pth into a TrainState (shapes are validated
    against the existing tree)."""
    import jax
    import torch

    raw = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    sd = raw.get("model_state_dict", raw)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    params, stats = convert_checkpoint(sd, head_type)

    import jax.numpy as jnp

    def cast_like(new, old):
        new = jnp.asarray(new, old.dtype)
        if new.shape != old.shape:
            raise ValueError(f"shape mismatch {new.shape} vs {old.shape}")
        return new

    merged_p = jax.tree_util.tree_map(
        cast_like, params, jax.tree_util.tree_map(lambda x: x, state.params),
        is_leaf=lambda x: not isinstance(x, dict))
    merged_s = state.batch_stats
    if stats and merged_s is not None:
        merged_s = _merged_stats(stats, merged_s)
    return state.replace(params=merged_p, batch_stats=merged_s)


def _merged_stats(new: Dict, old):
    import jax.numpy as jnp

    out = dict(old) if isinstance(old, dict) else old
    for k, v in new.items():
        if isinstance(v, dict):
            out[k] = _merged_stats(v, old.get(k, {}))
        else:
            out[k] = jnp.asarray(v, jnp.float32)
    return out
