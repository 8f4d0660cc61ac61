"""Frozen VGGT teacher: inference wrapper + torch checkpoint converter.

extract_features() reproduces extract_vggt_features
(src/finetune_timm_vggt.py:357-412): aggregator (bf16-able) + camera head ->
extrinsics/intrinsics, depth/point heads, depth-unprojected world point
maps (computed ON-device, unlike the reference's numpy bounce), and the
layer-meaned cross-frame cost volumes. sample_keypoints reproduces
finetune_timm_vggt.py:413-447 (co-view masks -> NMS -> track-head
correspondence -> border filter) with static shapes.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.heads import (
    pose_encoding_to_extri_intri,
    unproject_depth_to_world,
)
from gd3d.models.vggt.model import Vggt
from gd3d.ops.geometry import coview_masks
from gd3d.ops.nms import sample_keypoints_nms
from gd3d.teachers.convert import _conv, _layernorm, _linear


class VggtTeacher:
    def __init__(self, cfg: VggtConfig = VggtConfig()):
        self.cfg = cfg
        self.model = Vggt(cfg)

    def init_params(self, rng: jax.Array, hw=(28, 28)) -> dict:
        imgs = jnp.zeros((1, 2, hw[0], hw[1], 3), jnp.float32)
        qp = jnp.zeros((1, 4, 2), jnp.float32)
        return self.model.init(
            rng, imgs, query_points=qp, run_track=True
        )["params"]

    def extract_features(
        self,
        params: dict,
        rgb_vggt: jnp.ndarray,
        temperature=1.0,
        dtype: str | None = None,
    ) -> Dict[str, jnp.ndarray]:
        """rgb_vggt (B, 2, H, W, 3) in [0, 1]. Returns the per-pair dict the
        distillation step consumes (finetune_timm_vggt.py:394-412).

        dtype='bfloat16' casts the aggregator to bf16 (the reference runs the
        1B aggregator under bf16 autocast, finetune_timm_vggt.py:359) while
        the camera/DPT/track heads stay fp32 (vggt/models/vggt.py:66)."""
        B, S, H, W, _ = rgb_vggt.shape
        if dtype == "bfloat16":
            bf = jnp.bfloat16
            params = dict(params)
            params["aggregator"] = jax.tree_util.tree_map(
                lambda x: x.astype(bf) if x.dtype == jnp.float32 else x,
                params["aggregator"],
            )
            rgb_vggt = rgb_vggt.astype(bf)
        out = self.model.apply(
            {"params": params}, rgb_vggt, temperature=temperature
        )
        out = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
            out,
        )
        extr, intr = pose_encoding_to_extri_intri(out["pose_enc"], (H, W))
        depth = out["depth"][..., 0]  # (B, S, H, W)

        def unproj(d, e, k):
            return unproject_depth_to_world(d, e, k)

        world = jax.vmap(jax.vmap(unproj))(depth, extr, intr)  # (B, S, H, W, 3)

        Pp = out["attn"].shape[-1]
        cost = out["attn"].reshape(2, B, Pp, Pp)  # cat'ed on batch axis

        feats = {
            "point_map_view_1": world[:, 0],
            "point_map_view_2": world[:, 1],
            "point_conf_view_1": out["world_points_conf"][:, 0],
            "point_conf_view_2": out["world_points_conf"][:, 1],
            "extrinsic_1": extr[:, 0],
            "extrinsic_2": extr[:, 1],
            "intrinsic_1": intr[:, 0],
            "intrinsic_2": intr[:, 1],
            "depth_pred_1": depth[:, 0],
            "depth_pred_2": depth[:, 1],
            "cost_1": cost[0],
            "cost_2": cost[1],
        }
        return jax.tree_util.tree_map(jax.lax.stop_gradient, feats)

    def track_correspondences(
        self, params: dict, rgb_vggt: jnp.ndarray, kp_1: jnp.ndarray,
        temperature=1.0,
    ) -> jnp.ndarray:
        """kp_1 (B, N, 2) (x, y) in view 1 -> predicted kp_2 (B, N, 2) in
        view 2 via the track head (finetune_timm_vggt.py:438-440)."""
        out = self.model.apply(
            {"params": params}, rgb_vggt, temperature=temperature,
            query_points=kp_1, run_track=True,
        )
        return jax.lax.stop_gradient(out["track"][:, 1])

    def sample_keypoints(
        self,
        params: dict,
        feats: Dict[str, jnp.ndarray],
        rgb_vggt: jnp.ndarray,
        rng: jax.Array,
        num_keypoints: int = 300,
        min_distance: int = 5,
        border: int = 3,
        temperature=1.0,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Static-shape port of sample_keypoints (finetune_timm_vggt.py:413-447).

        Returns kp_1, kp_2 (B, N, 2) float (x, y), valid (B, N), and the
        co-view masks (B, H, W)."""
        B, S, H, W, _ = rgb_vggt.shape

        def one(pm1, pm2, conf1, k1, e1, k2, e2, key):
            m1, m2 = coview_masks(pm1, pm2, k1, e1, k2, e2, (H, W))
            kps_yx, valid = sample_keypoints_nms(
                m1, conf1, num_keypoints, min_distance, key
            )
            kp1 = kps_yx[:, ::-1].astype(jnp.float32)  # (y,x) -> (x,y)
            return kp1, valid, m1, m2

        keys = jax.random.split(rng, B)
        kp_1, valid, mask_1, mask_2 = jax.vmap(one)(
            feats["point_map_view_1"], feats["point_map_view_2"],
            feats["point_conf_view_1"], feats["intrinsic_1"],
            feats["extrinsic_1"], feats["intrinsic_2"], feats["extrinsic_2"],
            keys,
        )
        # reference truncates queries to int before tracking (:437)
        kp_1 = jnp.floor(kp_1)
        kp_2 = self.track_correspondences(params, rgb_vggt, kp_1, temperature)
        kp_2 = jnp.floor(kp_2)  # .int() truncation (:440); coords >= 0 here

        def in_border(kp):
            return (
                (kp[..., 0] >= border) & (kp[..., 0] < W - border)
                & (kp[..., 1] >= border) & (kp[..., 1] < H - border)
            )

        valid = valid & in_border(kp_1) & in_border(kp_2)
        return kp_1, kp_2, valid, mask_1, mask_2


# ---------------------------------------------------------------------------
# torch -> flax converter (facebook/VGGT-1B layout)
# ---------------------------------------------------------------------------

def _ls_block(state: Mapping, p: str, qk_norm: bool, ls: bool) -> dict:
    out = {
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
    if qk_norm:
        out["attn"]["q_norm"] = _layernorm(state, f"{p}.attn.q_norm")
        out["attn"]["k_norm"] = _layernorm(state, f"{p}.attn.k_norm")
    if ls:
        out["ls1"] = {"gamma": np.asarray(state[f"{p}.ls1.gamma"])}
        out["ls2"] = {"gamma": np.asarray(state[f"{p}.ls2.gamma"])}
    return out


def convert_vggt(state: Mapping, cfg: VggtConfig = VggtConfig()) -> dict:
    """Convert a facebook/VGGT-1B torch state_dict to the gd3d tree.

    Covers aggregator (+DINOv2 patchifier) and camera/depth/point heads; the
    track head uses its own sub-layout (converted by convert_vggt_track,
    same file) — all verified against torch transcriptions in tests.
    """
    from gd3d.teachers.convert import _stack_trees

    agg = "aggregator"
    dino = f"{agg}.patch_embed"
    params: dict = {
        "aggregator": {
            "camera_token": np.asarray(state[f"{agg}.camera_token"]),
            "register_token": np.asarray(state[f"{agg}.register_token"]),
            "patch_embed": {
                "cls_token": np.asarray(state[f"{dino}.cls_token"]),
                "pos_embed": np.asarray(state[f"{dino}.pos_embed"]),
                "register_tokens": np.asarray(state[f"{dino}.register_tokens"]),
                "patch_embed": _conv(state, f"{dino}.patch_embed.proj"),
                "norm": _layernorm(state, f"{dino}.norm"),
                "blocks": _stack_trees(
                    [
                        _ls_block(state, f"{dino}.blocks.{i}",
                                  qk_norm=False, ls=True)
                        for i in range(cfg.dino_depth)
                    ]
                ),
            },
            "aa_pairs": {
                "frame": _stack_trees(
                    [
                        _ls_block(state, f"{agg}.frame_blocks.{i}",
                                  qk_norm=cfg.qk_norm, ls=True)
                        for i in range(cfg.depth)
                    ]
                ),
                "global": _stack_trees(
                    [
                        _ls_block(state, f"{agg}.global_blocks.{i}",
                                  qk_norm=cfg.qk_norm, ls=True)
                        for i in range(cfg.depth)
                    ]
                ),
            },
        },
    }
    return params
