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
    def __init__(self, cfg: VggtConfig = VggtConfig(), sp_mesh=None,
                 sp_axis: str = "data", sp_batch_axis=None):
        """sp_mesh: a jax.sharding.Mesh enables ring-attention sequence
        parallelism on the aggregator's S*P global-attention axis over
        `sp_axis` (MeshConfig.sequence_parallel; gd3d/parallel/sequence.py).
        sp_batch_axis: keep the batch dim sharded over this (orthogonal)
        mesh axis — the DP x SP training regime; without it a data-sharded
        batch would collide with a data-axis ring and trigger the
        partitioner's replicate-and-repartition fallback.
        """
        self.cfg = cfg
        self.model = Vggt(cfg, sp_mesh=sp_mesh, sp_axis=sp_axis,
                          sp_batch_axis=sp_batch_axis)

    def init_params(self, rng: jax.Array, hw=(28, 28)) -> dict:
        imgs = jnp.zeros((1, 2, hw[0], hw[1], 3), jnp.float32)
        qp = jnp.zeros((1, 4, 2), jnp.float32)
        # jit: eager flax init of the 1B trunk dispatches thousands of tiny
        # ops — through the device tunnel (~40 ms each) that is >10 min;
        # jitted it is one compile + one dispatch
        return jax.jit(
            lambda r, im, q: self.model.init(
                r, im, query_points=q, run_track=True)
        )(rng, imgs, qp)["params"]

    def extract_features(
        self,
        params: dict,
        rgb_vggt: jnp.ndarray,
        temperature=1.0,
        dtype: str | None = None,
        return_track_tokens: bool = False,
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
            {"params": params}, rgb_vggt, temperature=temperature,
            return_track_tokens=return_track_tokens,
        )
        out = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
            out,
        )
        track_tokens = out.pop("track_tokens", None)
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
        feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
        if return_track_tokens:
            return feats, jax.tree_util.tree_map(
                jax.lax.stop_gradient, track_tokens)
        return feats

    def track_from_tokens(
        self, params: dict, track_tokens, image_hw, kp_1: jnp.ndarray,
    ) -> jnp.ndarray:
        """Track-head correspondence from PRECOMPUTED aggregator tokens —
        does not re-run the 1B trunk (the reference tracks from its saved
        aggregated_tokens_list, finetune_timm_vggt.py:438)."""
        out = self.model.apply(
            {"params": params}, track_tokens, tuple(image_hw), kp_1,
            method=Vggt.track,
        )
        return jax.lax.stop_gradient(out[:, 1])

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
        track_tokens=None,
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
        if track_tokens is not None:
            # fast path: track head on precomputed tokens (no 1B re-run)
            kp_2 = self.track_from_tokens(params, track_tokens, (H, W), kp_1)
        else:
            kp_2 = self.track_correspondences(
                params, rgb_vggt, kp_1, temperature)
        kp_2 = jnp.floor(kp_2)  # .int() truncation (:440); coords >= 0 here

        def in_border(kp):
            return (
                (kp[..., 0] >= border) & (kp[..., 0] < W - border)
                & (kp[..., 1] >= border) & (kp[..., 1] < H - border)
            )

        valid = valid & in_border(kp_1) & in_border(kp_2)
        return kp_1, kp_2, valid, mask_1, mask_2


def bias_params_for_live_keypoints(params: dict, cfg: VggtConfig) -> dict:
    """Copy of `params` with two tiny heads pinned to canonical outputs so a
    RANDOM-weight teacher still drives keypoints through the conf/co-view/
    track filters (multichip dryrun + mesh-equality tests).

    Random weights send reprojections out of frame and tracks out of the
    border, so every keypoint-dependent loss only ever exercises its
    zero-kp guard path (the reference treats 0 kps as a guard, not the
    norm — finetune_timm_vggt.py:585-597). Pinning the camera head to an
    identity pose (~57 deg FoV) makes each view's own unprojected depth
    reproject exactly in-bounds (co-view masks pass), and pinning the
    tracker's flow head to zero deltas keeps kp_2 = kp_1 inside the border
    filter. Every other weight — and every op of the real step — is
    untouched.
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # fresh containers
    pose = np.zeros(9, np.float32)
    # small +z translation: with an exact identity pose, each pixel
    # reprojects EXACTLY onto itself and the co-view bounds test sits on
    # the fp decision boundary — ~1e-7 sharded-vs-single reduction noise
    # then flips border-mask pixels (observed as a 24% KL divergence in
    # the TP equality test). Pushing the camera back shrinks reprojections
    # strictly inside the frame with real margin.
    pose[2] = 0.25
    pose[6] = 1.0  # identity quat, scalar-last (x, y, z, w)
    pose[7:] = 1.0  # fov_h = fov_w = 1 rad
    fc2 = params["camera_head"]["pose_branch"]["fc2"]
    # the head ACCUMULATES one delta per iteration; with a zero kernel each
    # delta is exactly the bias
    fc2["kernel"] = jnp.zeros_like(fc2["kernel"])
    fc2["bias"] = jnp.asarray(pose / cfg.camera_iterations).astype(
        fc2["bias"].dtype)
    fh = params["track_head"]["tracker"]["updateformer"]["flow_head"]
    fh["kernel"] = jnp.zeros_like(fh["kernel"])
    fh["bias"] = jnp.zeros_like(fh["bias"])
    return params


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


def _convert_vggt_dpt(state: Mapping, prefix: str, cfg: VggtConfig,
                      feature_only: bool = False) -> dict:
    """VGGT DPTHead params (vggt/heads/dpt_head.py:70-130): norm, per-hook
    1x1 projects, resize convT/conv layers, scratch rn convs + refinenets
    (refinenet4 has_residual=False), output convs."""
    tree: dict = {"norm": _layernorm(state, f"{prefix}.norm")}
    for i in range(4):
        tree[f"project_{i}"] = _conv(state, f"{prefix}.projects.{i}")
    from gd3d.teachers.mast3r import _conv_transpose

    tree["resize_0"] = _conv_transpose(state, f"{prefix}.resize_layers.0")
    tree["resize_1"] = _conv_transpose(state, f"{prefix}.resize_layers.1")
    tree["resize_3"] = _conv(state, f"{prefix}.resize_layers.3")
    for i in range(4):
        tree[f"layer_{i}_rn"] = _conv(
            state, f"{prefix}.scratch.layer{i + 1}_rn"
        )
    for i in range(1, 5):
        rp = f"{prefix}.scratch.refinenet{i}"
        blk = {
            "resConfUnit2": {
                "conv1": _conv(state, f"{rp}.resConfUnit2.conv1"),
                "conv2": _conv(state, f"{rp}.resConfUnit2.conv2"),
            },
            "out_conv": _conv(state, f"{rp}.out_conv"),
        }
        if i != 4:  # refinenet4 has_residual=False (dpt_head.py:436-439)
            blk["resConfUnit1"] = {
                "conv1": _conv(state, f"{rp}.resConfUnit1.conv1"),
                "conv2": _conv(state, f"{rp}.resConfUnit1.conv2"),
            }
        tree[f"refinenet{i}"] = blk
    tree["output_conv1"] = _conv(state, f"{prefix}.scratch.output_conv1")
    if not feature_only:
        tree["output_conv2_0"] = _conv(state, f"{prefix}.scratch.output_conv2.0")
        tree["output_conv2_2"] = _conv(state, f"{prefix}.scratch.output_conv2.2")
    return tree


def convert_vggt_camera_head(state: Mapping, cfg: VggtConfig,
                             prefix: str = "camera_head") -> dict:
    p = {
        "token_norm": _layernorm(state, f"{prefix}.token_norm"),
        "trunk_norm": _layernorm(state, f"{prefix}.trunk_norm"),
        "empty_pose_tokens": np.asarray(state[f"{prefix}.empty_pose_tokens"]),
        "embed_pose": _linear(state, f"{prefix}.embed_pose"),
        # upstream wraps the modulation Linear in Sequential(SiLU, Linear)
        "poseLN_modulation": _linear(state, f"{prefix}.poseLN_modulation.1")
        if f"{prefix}.poseLN_modulation.1.weight" in state
        else _linear(state, f"{prefix}.poseLN_modulation"),
        "pose_branch": {
            "fc1": _linear(state, f"{prefix}.pose_branch.fc1"),
            "fc2": _linear(state, f"{prefix}.pose_branch.fc2"),
        },
    }
    for i in range(cfg.camera_trunk_depth):
        b = f"{prefix}.trunk.{i}"
        p[f"trunk_{i}"] = {
            "norm1": _layernorm(state, f"{b}.norm1"),
            "norm2": _layernorm(state, f"{b}.norm2"),
            "attn": {
                "qkv": _linear(state, f"{b}.attn.qkv"),
                "proj": _linear(state, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(state, f"{b}.mlp.fc1"),
                "fc2": _linear(state, f"{b}.mlp.fc2"),
            },
            "ls1": {"gamma": np.asarray(state[f"{b}.ls1.gamma"])},
            "ls2": {"gamma": np.asarray(state[f"{b}.ls2.gamma"])},
        }
    return p


def convert_vggt(state: Mapping, cfg: VggtConfig = VggtConfig()) -> dict:
    """Convert a facebook/VGGT-1B torch state_dict to the gd3d tree:
    aggregator (+DINOv2 patchifier), camera head and depth/point DPT heads
    (+ the track head's DPT feature extractor when present). The CoTracker
    update-former sub-layout is converted by convert_vggt_tracker below."""
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
    if "camera_head.token_norm.weight" in state:
        params["camera_head"] = convert_vggt_camera_head(state, cfg)
    for head in ("depth_head", "point_head"):
        if f"{head}.norm.weight" in state:
            params[head] = _convert_vggt_dpt(state, head, cfg)
    if "track_head.feature_extractor.norm.weight" in state:
        params["track_head"] = {
            "feature_extractor": _convert_vggt_dpt(
                state, "track_head.feature_extractor", cfg, feature_only=True
            ),
            "tracker": convert_vggt_tracker(state, cfg),
        }
    return params


def convert_vggt_tracker(state: Mapping, cfg: VggtConfig,
                         prefix: str = "track_head.tracker") -> dict:
    """BaseTrackerPredictor params (track_modules/base_track_predictor.py):
    corr MLP, EfficientUpdateFormer (torch MultiheadAttention packed
    projections), per-iteration feature updater and vis/conf heads."""

    def mha(p):
        return {
            "in_proj_weight": np.asarray(state[f"{p}.in_proj_weight"]),
            "in_proj_bias": np.asarray(state[f"{p}.in_proj_bias"]),
            "out_proj": _linear(state, f"{p}.out_proj"),
        }

    def attn_block(p):
        return {
            "norm1": _layernorm(state, f"{p}.norm1"),
            "norm2": _layernorm(state, f"{p}.norm2"),
            "attn": mha(f"{p}.attn"),
            "mlp": {
                "fc1": _linear(state, f"{p}.mlp.fc1"),
                "fc2": _linear(state, f"{p}.mlp.fc2"),
            },
        }

    def cross_block(p):
        return {
            "norm1": _layernorm(state, f"{p}.norm1"),
            "norm_context": _layernorm(state, f"{p}.norm_context"),
            "norm2": _layernorm(state, f"{p}.norm2"),
            "cross_attn": mha(f"{p}.cross_attn"),
            "mlp": {
                "fc1": _linear(state, f"{p}.mlp.fc1"),
                "fc2": _linear(state, f"{p}.mlp.fc2"),
            },
        }

    uf = f"{prefix}.updateformer"
    tree: dict = {
        "fmap_norm": _layernorm(state, f"{prefix}.fmap_norm"),
        "ffeat_norm": {
            "scale": np.asarray(state[f"{prefix}.ffeat_norm.weight"]),
            "bias": np.asarray(state[f"{prefix}.ffeat_norm.bias"]),
        },
        "ffeat_updater": _linear(state, f"{prefix}.ffeat_updater.0"),
        "vis_predictor": _linear(state, f"{prefix}.vis_predictor.0"),
        "conf_predictor": _linear(state, f"{prefix}.conf_predictor.0"),
        "query_ref_token": np.asarray(state[f"{prefix}.query_ref_token"]),
        "corr_mlp": {
            "fc1": _linear(state, f"{prefix}.corr_mlp.fc1"),
            "fc2": _linear(state, f"{prefix}.corr_mlp.fc2"),
        },
        "updateformer": {
            "input_norm": _layernorm(state, f"{uf}.input_norm"),
            "input_transform": _linear(state, f"{uf}.input_transform"),
            "output_norm": _layernorm(state, f"{uf}.output_norm"),
            "flow_head": _linear(state, f"{uf}.flow_head"),
            # upstream's typo'd name 'virual_tracks' preserved on their side
            "virtual_tracks": np.asarray(state[f"{uf}.virual_tracks"]),
        },
    }
    for i in range(cfg.track_depth):
        tree["updateformer"][f"time_{i}"] = attn_block(f"{uf}.time_blocks.{i}")
    n_space = cfg.track_depth
    for j in range(n_space):
        if f"{uf}.space_virtual_blocks.{j}.norm1.weight" not in state:
            break
        tree["updateformer"][f"space_{j}"] = attn_block(
            f"{uf}.space_virtual_blocks.{j}"
        )
        tree["updateformer"][f"v2p_{j}"] = cross_block(
            f"{uf}.space_virtual2point_blocks.{j}"
        )
        tree["updateformer"][f"p2v_{j}"] = cross_block(
            f"{uf}.space_point2virtual_blocks.{j}"
        )
    return tree
