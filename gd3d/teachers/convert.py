"""torch checkpoint -> gd3d flax param-tree converters.

The pretrained weights (timm CLIP ViT student, MASt3R, VGGT) cannot be
re-trained here; these converters map torch state_dicts (loaded offline) to
the exact flax trees our models expect. Conventions:
  Linear:  torch (out, in) weight -> flax kernel (in, out) = W.T
  Conv2d:  torch (out, in, kh, kw) -> flax (kh, kw, in, out)
  LayerNorm: weight -> scale, bias -> bias
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from gd3d.core.config import StudentConfig


def _t(x) -> np.ndarray:
    x = np.asarray(x)
    return x


def _linear(state: Mapping, prefix: str) -> Dict:
    out = {"kernel": _t(state[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in state:
        out["bias"] = _t(state[f"{prefix}.bias"])
    return out


def _layernorm(state: Mapping, prefix: str) -> Dict:
    return {
        "scale": _t(state[f"{prefix}.weight"]),
        "bias": _t(state[f"{prefix}.bias"]),
    }


def _conv(state: Mapping, prefix: str) -> Dict:
    w = _t(state[f"{prefix}.weight"])  # (out, in, kh, kw)
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _t(state[f"{prefix}.bias"])
    return out


def _stack_trees(trees) -> Dict:
    """Stack a list of identical param trees along a new leading axis (the
    nn.scan weight-stacking layout)."""
    out: Dict = {}
    for k in trees[0]:
        if isinstance(trees[0][k], dict):
            out[k] = _stack_trees([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees])
    return out


def convert_timm_vit(state: Mapping, cfg: StudentConfig) -> Dict:
    """Convert a timm VisionTransformer state_dict (pre-LoRA mutation,
    `vit_base_patch16_clip_384.*` layout) to the gd3d ViT param tree.

    The gd3d ViT runs its blocks as nn.scan groups (`blocks_plain` for
    blocks[:lora_start], `blocks_adapt` for blocks[lora_start:]), so the
    per-layer torch tensors are stacked along a leading layer axis.

    LoRA/adapter params are NOT present in pretrained checkpoints; callers
    should graft them from a fresh init (they are zero-impact at start:
    lora_b is zero-init; adapters train from scratch like the reference).
    """
    params: Dict = {
        "cls_token": _t(state["cls_token"]),
        "pos_embed": _t(state["pos_embed"]),
        "patch_embed": _conv(state, "patch_embed.proj"),
        "norm": _layernorm(state, "norm"),
    }
    if "norm_pre.weight" in state:  # CLIP variants: pre_norm=True
        params["norm_pre"] = _layernorm(state, "norm_pre")

    def block_tree(i: int) -> Dict:
        p = f"blocks.{i}"
        return {
            "norm1": _layernorm(state, f"{p}.norm1"),
            "norm2": _layernorm(state, f"{p}.norm2"),
            "attn": {
                "qkv": _linear(state, f"{p}.attn.qkv"),
                "proj": _linear(state, f"{p}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(state, f"{p}.mlp.fc1"),
                "fc2": _linear(state, f"{p}.mlp.fc2"),
            },
        }

    n_plain = min(cfg.lora_start_block, cfg.depth)
    if n_plain > 0:
        params["blocks_plain"] = _stack_trees(
            [block_tree(i) for i in range(n_plain)]
        )
    if cfg.depth - n_plain > 0:
        params["blocks_adapt"] = _stack_trees(
            [block_tree(i) for i in range(n_plain, cfg.depth)]
        )
    return params


def graft_pretrained_vit(fresh_vit_params: Dict, converted: Dict) -> Dict:
    """Overlay converted pretrained weights onto a freshly-initialized tree
    (which carries the LoRA/adapter leaves the checkpoint lacks)."""
    import jax

    merged = jax.tree_util.tree_map(lambda x: x, fresh_vit_params)  # copy

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst[k], v)
            else:
                assert dst[k].shape == v.shape, (k, dst[k].shape, v.shape)
                dst[k] = v

    overlay(merged, converted)
    return merged
