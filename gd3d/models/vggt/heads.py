"""VGGT heads: camera (adaLN iterative trunk) and DPT (depth/point/feature).

Parity targets: vggt/heads/camera_head.py:19-162, vggt/heads/dpt_head.py
(projects/resize_layers :70-100, scratch_forward :274-305, pos-embed grids
:262-272), vggt/heads/head_act.py, vggt/heads/utils.py, vggt/utils/pose_enc.py
and rotation.py (quat scalar-last), vggt/utils/geometry.py:12-115 — the
depth->world unprojection is kept ON-DEVICE here (the reference bounces to
numpy, SURVEY.md §3.2 flags it as a device->host boundary).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gd3d.models.dpt import resize_bilinear_ac
from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.layers import VggtBlock, VggtMlp


# ----------------------------------------------------------- activations
def inverse_log_transform(y):
    return jnp.sign(y) * jnp.expm1(jnp.abs(y))


def activate_head(out_nhwc, activation="inv_log", conf_activation="expp1"):
    xyz = out_nhwc[..., :-1]
    conf = out_nhwc[..., -1]
    if activation == "norm_exp":
        d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1, keepdims=True), 1e-8)
        pts = xyz / d * jnp.expm1(d)
    elif activation == "exp":
        pts = jnp.exp(xyz)
    elif activation == "inv_log":
        pts = inverse_log_transform(xyz)
    elif activation == "linear":
        pts = xyz
    else:
        raise ValueError(activation)
    if conf_activation == "expp1":
        conf = 1.0 + jnp.exp(conf)
    elif conf_activation == "expp0":
        conf = jnp.exp(conf)
    elif conf_activation == "sigmoid":
        conf = jax.nn.sigmoid(conf)
    else:
        raise ValueError(conf_activation)
    return pts, conf


# --------------------------------------------------------------- camera
class CameraHead(nn.Module):
    """4-iteration adaLN-modulated trunk on the camera token -> 9-d pose."""

    cfg: VggtConfig

    @nn.compact
    def __call__(self, last_tokens: jnp.ndarray, num_iterations: int = 4):
        """last_tokens: (B, S, P, 2C). Returns (B, S, 9) from the final iter."""
        cfg = self.cfg
        dim = 2 * cfg.embed_dim
        pose_tokens = last_tokens[:, :, 0]  # (B, S, 2C)
        # camera_head.py:53-75: trunk Blocks + token/trunk norms all take
        # torch DEFAULT nn.LayerNorm (eps 1e-5); only adaln pins 1e-6
        pose_tokens = nn.LayerNorm(epsilon=1e-5, name="token_norm")(
            pose_tokens)
        B, S, _ = pose_tokens.shape

        empty_pose = self.param(
            "empty_pose_tokens", nn.initializers.zeros, (1, 1, 9)
        )
        embed_pose = nn.Dense(dim, name="embed_pose")
        mod_dense = nn.Dense(3 * dim, name="poseLN_modulation")
        trunk_blocks = [
            VggtBlock(dim, cfg.num_heads, 4.0, init_values=0.01,
                      eps=1e-5, name=f"trunk_{i}")
            for i in range(cfg.camera_trunk_depth)
        ]
        trunk_norm = nn.LayerNorm(epsilon=1e-5, name="trunk_norm")
        pose_branch = VggtMlp(9, dim // 2, name="pose_branch")
        adaln_norm = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, name="adaln_norm"
        )

        pred = None
        for _ in range(num_iterations):
            if pred is None:
                module_input = embed_pose(
                    jnp.broadcast_to(empty_pose, (B, S, 9))
                )
            else:
                module_input = embed_pose(jax.lax.stop_gradient(pred))
            mod = mod_dense(nn.silu(module_input))
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            normed = adaln_norm(pose_tokens)
            h = gate * (normed * (1 + scale) + shift) + pose_tokens
            for blk in trunk_blocks:
                h, _ = blk(h)
            delta = pose_branch(trunk_norm(h))
            pred = delta if pred is None else pred + delta
        # activation: fl relu, rest linear (camera_head.py:33-36)
        T, quat, fl = pred[..., :3], pred[..., 3:7], pred[..., 7:]
        return jnp.concatenate([T, quat, nn.relu(fl)], axis=-1)


# ----------------------------------------------------------------- DPT
def _make_sincos_pos_embed(embed_dim: int, pos: jnp.ndarray, omega_0: float = 100.0):
    # omega in HOST float64 (vggt/heads/utils.py:48 computes it in double;
    # jnp.arange(dtype=float64) silently downgrades to fp32 under the
    # default x64-disabled config — track.py does the same on host)
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = jnp.asarray(1.0 / (omega_0**omega), jnp.float32)
    out = pos.reshape(-1)[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=1).astype(jnp.float32)


def _uv_pos_embed(gh: int, gw: int, aspect: float, dim: int) -> jnp.ndarray:
    """create_uv_grid + position_grid_to_embed (vggt/heads/utils.py:11-105)."""
    diag = (aspect**2 + 1.0) ** 0.5
    span_x = aspect / diag
    span_y = 1.0 / diag
    xs = np.linspace(-span_x * (gw - 1) / gw, span_x * (gw - 1) / gw, gw)
    ys = np.linspace(-span_y * (gh - 1) / gh, span_y * (gh - 1) / gh, gh)
    uu, vv = np.meshgrid(xs, ys)  # indexing='xy'
    grid = jnp.asarray(np.stack([uu, vv], -1), jnp.float32)  # (gh, gw, 2)
    emb_x = _make_sincos_pos_embed(dim // 2, grid[..., 0])
    emb_y = _make_sincos_pos_embed(dim // 2, grid[..., 1])
    return jnp.concatenate([emb_x, emb_y], -1).reshape(gh, gw, dim)


class VggtResidualConvUnit(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        # the reference's activation is nn.ReLU(inplace=True)
        # (_make_fusion_block, dpt_head.py:315): `out = relu(x)` mutates x
        # itself, so the residual skip_add at :399 actually adds relu(x),
        # NOT x — reproduce that quirk
        xr = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(xr)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(out)
        return out + xr


class VggtFusionBlock(nn.Module):
    features: int
    has_residual: bool = True

    @nn.compact
    def __call__(self, x, skip=None, out_hw: Optional[Tuple[int, int]] = None):
        if self.has_residual and skip is not None:
            x = x + VggtResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = VggtResidualConvUnit(self.features, name="resConfUnit2")(x)
        B, H, W, C = x.shape
        target = out_hw if out_hw is not None else (2 * H, 2 * W)
        x = resize_bilinear_ac(x, target)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class VggtDPTHead(nn.Module):
    """DPT over aggregator hooks [4, 11, 17, 23].

    __call__(tokens_list, (H, W)) -> (B, S, H/dr, W/dr, out) activated, or
    raw features when feature_only (track-head feature extractor,
    down_ratio=2, pos_embed=False)."""

    cfg: VggtConfig
    output_dim: int = 4
    activation: str = "inv_log"
    conf_activation: str = "expp1"
    features: int = 256
    feature_only: bool = False
    down_ratio: int = 1
    use_pos_embed: bool = True

    @nn.compact
    def __call__(self, tokens_list: List[jnp.ndarray], image_hw: Tuple[int, int]):
        cfg = self.cfg
        H, W = image_hw
        ps = cfg.patch_size
        gh, gw = H // ps, W // ps
        psi = cfg.patch_start_idx
        out_ch = cfg.dpt_out_channels

        norm = nn.LayerNorm(epsilon=1e-5, name="norm")
        feats = []
        for idx, hook in enumerate(cfg.dpt_hooks):
            t = tokens_list[hook][:, :, psi:]  # (B, S, P, 2C)
            B, S, P, C2 = t.shape
            x = norm(t.reshape(B * S, P, C2))
            x = x.reshape(B * S, gh, gw, C2)
            x = nn.Conv(out_ch[idx], (1, 1), name=f"project_{idx}")(x)
            if self.use_pos_embed:
                pe = _uv_pos_embed(x.shape[1], x.shape[2], W / H, x.shape[-1])
                x = x + 0.1 * pe[None]
            if idx == 0:
                x = nn.ConvTranspose(out_ch[0], (4, 4), strides=(4, 4),
                                     padding="VALID", name="resize_0")(x)
            elif idx == 1:
                x = nn.ConvTranspose(out_ch[1], (2, 2), strides=(2, 2),
                                     padding="VALID", name="resize_1")(x)
            elif idx == 3:
                # torch padding=1 semantics (see gd3d/models/dpt.py)
                x = nn.Conv(out_ch[3], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="resize_3")(x)
            feats.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name=f"layer_{i}_rn")(f)
            for i, f in enumerate(feats)
        ]
        out = VggtFusionBlock(self.features, has_residual=False,
                              name="refinenet4")(
            rn[3], out_hw=rn[2].shape[1:3]
        )
        out = VggtFusionBlock(self.features, name="refinenet3")(
            out, rn[2], out_hw=rn[1].shape[1:3]
        )
        out = VggtFusionBlock(self.features, name="refinenet2")(
            out, rn[1], out_hw=rn[0].shape[1:3]
        )
        out = VggtFusionBlock(self.features, name="refinenet1")(out, rn[0])

        if self.feature_only:
            out = nn.Conv(self.features, (3, 3), padding="SAME",
                          name="output_conv1")(out)
        else:
            out = nn.Conv(self.features // 2, (3, 3), padding="SAME",
                          name="output_conv1")(out)
        target = (H // self.down_ratio, W // self.down_ratio)
        out = resize_bilinear_ac(out, target)
        if self.use_pos_embed:
            pe = _uv_pos_embed(out.shape[1], out.shape[2], W / H, out.shape[-1])
            out = out + 0.1 * pe[None]
        BS = out.shape[0]
        B = tokens_list[0].shape[0]
        S = BS // B
        if self.feature_only:
            return out.reshape(B, S, *out.shape[1:])

        out = nn.Conv(32, (3, 3), padding="SAME", name="output_conv2_0")(out)
        out = nn.relu(out)
        out = nn.Conv(self.output_dim, (1, 1), name="output_conv2_2")(out)
        pts, conf = activate_head(out, self.activation, self.conf_activation)
        return (
            pts.reshape(B, S, *pts.shape[1:]),
            conf.reshape(B, S, *conf.shape[1:]),
        )


# ---------------------------------------------------- pose enc / geometry
def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
    """Scalar-last (x, y, z, w) quaternion -> rotation matrix
    (vggt/utils/rotation.py:14-44)."""
    i, j, k, r = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def pose_encoding_to_extri_intri(
    pose_enc: jnp.ndarray, image_hw: Tuple[int, int]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 9) absT_quaR_FoV -> ((..., 3, 4) extrinsic, (..., 3, 3) intrinsic);
    vggt/utils/pose_enc.py:66-130."""
    T = pose_enc[..., :3]
    quat = pose_enc[..., 3:7]
    fov_h = pose_enc[..., 7]
    fov_w = pose_enc[..., 8]
    R = quat_to_mat(quat)
    extr = jnp.concatenate([R, T[..., None]], axis=-1)
    H, W = image_hw
    fy = (H / 2.0) / jnp.tan(fov_h / 2.0)
    fx = (W / 2.0) / jnp.tan(fov_w / 2.0)
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    intr = jnp.stack(
        [
            jnp.stack([fx, zeros, ones * (W / 2)], -1),
            jnp.stack([zeros, fy, ones * (H / 2)], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return extr, intr


def closed_form_inverse_se3(extr: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 4) [R|t] world->cam -> (..., 3, 4) cam->world."""
    R = extr[..., :3, :3]
    t = extr[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    return jnp.concatenate([Rt, -Rt @ t], axis=-1)


def unproject_depth_to_world(
    depth: jnp.ndarray, extrinsic: jnp.ndarray, intrinsic: jnp.ndarray
) -> jnp.ndarray:
    """Depth (H, W) + OpenCV [R|t] + K -> (H, W, 3) world points.

    On-device equivalent of vggt/utils/geometry.py:12-80 (reference runs it
    in numpy on the host)."""
    H, W = depth.shape
    xs = jnp.arange(W, dtype=jnp.float32)
    ys = jnp.arange(H, dtype=jnp.float32)
    u, v = jnp.meshgrid(xs, ys)  # (H, W)
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    cam = jnp.stack([x, y, depth], axis=-1)
    inv = closed_form_inverse_se3(extrinsic)
    return cam @ inv[:3, :3].T + inv[:3, 3]
