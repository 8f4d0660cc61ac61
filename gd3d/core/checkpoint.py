"""Checkpointing: orbax for native checkpoints + the reference's key layout.

The reference persists ONLY adapter state with keys
  w_a_%03d / w_b_%03d            LoRA A/B torch weights (r, dim) / (dim, r)
  state_dict.refine_conv         {'weight','bias'}
  depth_diff_head                DepthAwareFeatureFusion.state_dict()
  adapter_%03d                   {'down.weight','up.weight'}
(src/finetune_timm_mast3r.py:172-215). export_reference_layout /
import_reference_layout convert between that layout and our trainable tree so
checkpoints interoperate in both directions.
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np
import orbax.checkpoint as ocp

from gd3d.core.config import StudentConfig


# --------------------------------------------------------------- orbax
def save_checkpoint(path: str, state: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, target: Any) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)


def save_train_state(path: str, state: Any, epoch: int) -> None:
    """Persist the FULL training state (trainable + optimizer + step) plus
    the epoch counter for restart — the analogue of Lightning's `save_last`
    restart checkpoint (/root/reference/src/main.py:138-145)."""
    payload = {
        "trainable": jax.device_get(state.trainable),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(jax.device_get(state.step)),
        "epoch": np.asarray(epoch, np.int32),
    }
    save_checkpoint(path, payload)


def restore_train_state(path: str, state: Any):
    """Restore a save_train_state checkpoint onto a freshly-initialized
    TrainState. Returns (state, next_epoch)."""
    template = {
        "trainable": jax.device_get(state.trainable),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(jax.device_get(state.step)),
        "epoch": np.asarray(0, np.int32),
    }
    payload = restore_checkpoint(path, template)
    state = state.replace(
        trainable=payload["trainable"],
        opt_state=payload["opt_state"],
        step=payload["step"],
    )
    return state, int(payload["epoch"]) + 1


def load_reference_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference Lightning .ckpt and flatten it to the reference key
    layout consumed by import_reference_layout.

    The reference's on_save_checkpoint puts w_a_%03d / w_b_%03d /
    depth_diff_head / adapter_%03d at the checkpoint top level and
    refine_conv under 'state_dict' (finetune_timm_mast3r.py:172-191).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    flat: Dict[str, np.ndarray] = {}

    def to_np(t):
        # the reference's on_save_checkpoint stores w_As[i].weight as raw
        # trainable nn.Parameters (finetune_timm_mast3r.py:174-185);
        # .numpy() on a requires_grad tensor raises — detach first
        return t.detach().cpu().numpy() if hasattr(t, "detach") else t.numpy()

    def emit(prefix, obj):
        if hasattr(obj, "numpy"):
            flat[prefix] = to_np(obj)
        elif isinstance(obj, dict):
            for k, v in obj.items():
                emit(f"{prefix}.{k}" if prefix else k, v)

    for key, val in ckpt.items():
        if key.startswith(("w_a_", "w_b_")):
            flat[key] = to_np(val)
        elif key.startswith("adapter_"):
            emit(key, val)
        elif key == "depth_diff_head":
            emit("depth_diff_head", val)
        elif key == "state_dict" and isinstance(val, dict):
            if "refine_conv" in val:
                emit("refine_conv", val["refine_conv"])
    return flat


# ------------------------------------------------- reference key layout
def _lora_blocks(cfg: StudentConfig):
    return list(range(cfg.lora_start_block, cfg.depth))


def export_reference_layout(trainable: Dict, cfg: StudentConfig) -> Dict[str, np.ndarray]:
    """Flatten the trainable tree into the reference checkpoint key layout.

    LoRA ordering matches the reference append order (a_q, a_v per block,
    finetune_timm_mast3r.py:118-136): w_a_{2k} = block_k's A_q,
    w_a_{2k+1} = A_v; torch Linear weights are (out, in) = our kernel^T.
    gd3d stores the LoRA blocks weight-stacked under `blocks_adapt` (nn.scan
    layout); k indexes the stack.
    """
    out: Dict[str, np.ndarray] = {}
    vit = trainable["vit"]
    attn = vit["blocks_adapt"]["attn"]
    for k, _blk_idx in enumerate(_lora_blocks(cfg)):
        out[f"w_a_{2 * k:03d}"] = np.asarray(attn["lora_a_q"]["kernel"][k]).T
        out[f"w_b_{2 * k:03d}"] = np.asarray(attn["lora_b_q"]["kernel"][k]).T
        out[f"w_a_{2 * k + 1:03d}"] = np.asarray(attn["lora_a_v"]["kernel"][k]).T
        out[f"w_b_{2 * k + 1:03d}"] = np.asarray(attn["lora_b_v"]["kernel"][k]).T
        if cfg.use_adapters:
            ad = vit["blocks_adapt"]["adapter"]
            out[f"adapter_{k:03d}.down.weight"] = np.asarray(
                ad["down"]["kernel"][k]
            ).T
            out[f"adapter_{k:03d}.up.weight"] = np.asarray(ad["up"]["kernel"][k]).T

    rc = trainable["refine_conv"]["conv"]
    # flax conv kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
    out["refine_conv.weight"] = np.asarray(rc["kernel"]).transpose(3, 2, 0, 1)
    out["refine_conv.bias"] = np.asarray(rc["bias"])

    dh = trainable["depth_diff_head"]
    out["depth_diff_head.depth_attention.0.weight"] = np.asarray(
        dh["depth_attn_fc1"]["kernel"]
    ).T
    out["depth_diff_head.depth_attention.0.bias"] = np.asarray(
        dh["depth_attn_fc1"]["bias"]
    )
    out["depth_diff_head.depth_attention.2.weight"] = np.asarray(
        dh["depth_attn_fc2"]["kernel"]
    ).T
    out["depth_diff_head.depth_attention.2.bias"] = np.asarray(
        dh["depth_attn_fc2"]["bias"]
    )
    out["depth_diff_head.fusion_layer.0.weight"] = np.asarray(
        dh["fusion_in"]["kernel"]
    ).T
    out["depth_diff_head.fusion_layer.0.bias"] = np.asarray(dh["fusion_in"]["bias"])
    out["depth_diff_head.fusion_layer.1.weight"] = np.asarray(dh["fusion_ln"]["scale"])
    out["depth_diff_head.fusion_layer.1.bias"] = np.asarray(dh["fusion_ln"]["bias"])
    out["depth_diff_head.fusion_layer.3.weight"] = np.asarray(
        dh["fusion_out"]["kernel"]
    ).T
    out["depth_diff_head.fusion_layer.3.bias"] = np.asarray(dh["fusion_out"]["bias"])
    return out


def import_reference_layout(
    trainable: Dict, flat: Dict[str, np.ndarray], cfg: StudentConfig
) -> Dict:
    """Inverse of export_reference_layout: overlay reference-layout tensors
    onto a trainable tree (e.g. to load a torch-trained adapter checkpoint)."""
    new = jax.tree_util.tree_map(np.asarray, trainable)
    vit = new["vit"]
    attn = vit["blocks_adapt"]["attn"]
    n = len(_lora_blocks(cfg))
    for name in ("lora_a_q", "lora_b_q", "lora_a_v", "lora_b_v"):
        attn[name]["kernel"] = attn[name]["kernel"].copy()
    for k in range(n):
        attn["lora_a_q"]["kernel"][k] = np.asarray(flat[f"w_a_{2 * k:03d}"]).T
        attn["lora_b_q"]["kernel"][k] = np.asarray(flat[f"w_b_{2 * k:03d}"]).T
        attn["lora_a_v"]["kernel"][k] = np.asarray(flat[f"w_a_{2 * k + 1:03d}"]).T
        attn["lora_b_v"]["kernel"][k] = np.asarray(flat[f"w_b_{2 * k + 1:03d}"]).T
    if cfg.use_adapters:
        ad = vit["blocks_adapt"]["adapter"]
        ad["down"]["kernel"] = ad["down"]["kernel"].copy()
        ad["up"]["kernel"] = ad["up"]["kernel"].copy()
        for k in range(n):
            ad["down"]["kernel"][k] = np.asarray(
                flat[f"adapter_{k:03d}.down.weight"]
            ).T
            ad["up"]["kernel"][k] = np.asarray(flat[f"adapter_{k:03d}.up.weight"]).T

    rc = new["refine_conv"]["conv"]
    rc["kernel"] = np.asarray(flat["refine_conv.weight"]).transpose(2, 3, 1, 0)
    rc["bias"] = np.asarray(flat["refine_conv.bias"])

    dh = new["depth_diff_head"]
    dh["depth_attn_fc1"]["kernel"] = np.asarray(
        flat["depth_diff_head.depth_attention.0.weight"]
    ).T
    dh["depth_attn_fc1"]["bias"] = np.asarray(
        flat["depth_diff_head.depth_attention.0.bias"]
    )
    dh["depth_attn_fc2"]["kernel"] = np.asarray(
        flat["depth_diff_head.depth_attention.2.weight"]
    ).T
    dh["depth_attn_fc2"]["bias"] = np.asarray(
        flat["depth_diff_head.depth_attention.2.bias"]
    )
    dh["fusion_in"]["kernel"] = np.asarray(
        flat["depth_diff_head.fusion_layer.0.weight"]
    ).T
    dh["fusion_in"]["bias"] = np.asarray(flat["depth_diff_head.fusion_layer.0.bias"])
    dh["fusion_ln"]["scale"] = np.asarray(flat["depth_diff_head.fusion_layer.1.weight"])
    dh["fusion_ln"]["bias"] = np.asarray(flat["depth_diff_head.fusion_layer.1.bias"])
    dh["fusion_out"]["kernel"] = np.asarray(
        flat["depth_diff_head.fusion_layer.3.weight"]
    ).T
    dh["fusion_out"]["bias"] = np.asarray(flat["depth_diff_head.fusion_layer.3.bias"])
    return new
