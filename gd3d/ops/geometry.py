"""Geometry ops: projection, unprojection, depth rasterization, co-view masks.

Parity targets in /root/reference/utils/functions.py:
  point_cloud_to_depth (:218-259), extract_kp_depth (:348-372),
  compute_projection (:425-442), convert_camera_to_world (:454-459),
  get_coview_mask(s) (:445-472), img_coord_2_obj_coord (:35-51),
  query_pose_error (:114-141).

Everything device-side is static-shaped (scatter via segment ops) so it lives
inside the jitted train step — the reference bounces several of these to
numpy/CPU.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def point_cloud_to_depth(
    points: jnp.ndarray, K: jnp.ndarray, w: int, h: int
) -> jnp.ndarray:
    """Rasterize camera-frame points (N, 3) to an (h, w) average-Z depth map.

    Matches utils/functions.py:218-259: round to nearest pixel, average Z of
    all points landing on a pixel, zero where empty. The torch original does
    unique+bincount; here a fixed-size scatter-add keeps it on-device.
    Returns (1, 1, h, w) float32 like the reference.
    """
    X, Y, Z = points[:, 0], points[:, 1], points[:, 2]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    zsafe = jnp.where(Z > 0, Z, 1.0)
    u = jnp.round((X / zsafe) * fx + cx).astype(jnp.int32)
    v = jnp.round((Y / zsafe) * fy + cy).astype(jnp.int32)

    valid = (Z > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    idx = jnp.where(valid, v * w + u, h * w)  # dump invalid in overflow bin

    zsum = jnp.zeros((h * w + 1,), jnp.float32).at[idx].add(
        jnp.where(valid, Z, 0.0).astype(jnp.float32)
    )
    cnt = jnp.zeros((h * w + 1,), jnp.float32).at[idx].add(valid.astype(jnp.float32))
    avg = jnp.where(cnt > 0, zsum / jnp.maximum(cnt, 1.0), 0.0)[: h * w]
    return avg.reshape(1, 1, h, w)


def extract_kp_depth(
    depth_map: jnp.ndarray, kp: jnp.ndarray, window_size: int = 3
) -> jnp.ndarray:
    """Average depth in a window around each keypoint.

    Matches utils/functions.py:348-372: replicate-pad, window mean, gather at
    floor(kp) (torch .long() truncation; kps are non-negative).

    Args:
      depth_map: (H, W).
      kp: (B, N, 2) as (x, y).
    Returns (B, N).
    """
    H, W = depth_map.shape[-2:]
    half = window_size // 2
    padded = jnp.pad(
        depth_map.reshape(H, W), ((half, half), (half, half)), mode="edge"
    )
    # window mean via cumulative conv — small window, direct sum is fine
    patches = jnp.zeros((H, W), padded.dtype)
    for dy in range(window_size):
        for dx in range(window_size):
            patches = patches + padded[dy : dy + H, dx : dx + W]
    patch_means = patches / float(window_size * window_size)

    x = jnp.clip(kp[..., 0].astype(jnp.int32), 0, W - 1)
    y = jnp.clip(kp[..., 1].astype(jnp.int32), 0, H - 1)
    return patch_means[y, x]


def compute_projection(P: jnp.ndarray, points_3d: jnp.ndarray) -> jnp.ndarray:
    """Project world points through a (3, 4) matrix; utils/functions.py:425-442."""
    shape = points_3d.shape[:-1]
    pts = points_3d.reshape(-1, 3)
    ones = jnp.ones((pts.shape[0], 1), pts.dtype)
    ph = (P @ jnp.concatenate([pts, ones], axis=1).T).T  # (N, 3)
    proj = ph[:, :2] / (ph[:, 2:3] + 1e-8)
    return proj.reshape(*shape, 2)


def convert_camera_to_world(
    point_map: jnp.ndarray, extrinsic: jnp.ndarray
) -> jnp.ndarray:
    """Camera->world used by the co-view masks; utils/functions.py:454-459.

    Parity note: the reference computes (x - t) @ R^T (its `R_inv = R.t()`
    then `matmul(point_map - t, R_inv)`), which for an OpenCV world->cam
    [R|t] is NOT the geometric inverse ((x - t) @ R would be). We reproduce
    the reference formula exactly since the distillation masks were trained
    with it.
    """
    R = extrinsic[:, :3]
    t = extrinsic[:, 3][None, :]
    flat = point_map.reshape(-1, 3)
    world = (flat - t) @ R.T
    return world.reshape(point_map.shape)


def coview_mask(
    point_map: jnp.ndarray, P_other: jnp.ndarray, image_shape: Tuple[int, int]
) -> jnp.ndarray:
    proj = compute_projection(P_other, point_map)
    u, v = proj[..., 0], proj[..., 1]
    H, W = image_shape
    return (u >= 0) & (u < W) & (v >= 0) & (v < H)


def coview_masks(
    point_map_view1: jnp.ndarray,
    point_map_view2: jnp.ndarray,
    intrinsic1: jnp.ndarray,
    extrinsic1: jnp.ndarray,
    intrinsic2: jnp.ndarray,
    extrinsic2: jnp.ndarray,
    image_shape: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mutual-reprojection visibility masks; utils/functions.py:462-472.

    NOTE: the reference converts BOTH views' camera-frame points with
    extrinsic1 (utils/functions.py:463-464) — kept for parity.
    """
    world1 = convert_camera_to_world(point_map_view1, extrinsic1)
    world2 = convert_camera_to_world(point_map_view2, extrinsic1)
    P1 = intrinsic1 @ extrinsic1
    P2 = intrinsic2 @ extrinsic2
    return coview_mask(world1, P2, image_shape), coview_mask(world2, P1, image_shape)


# ---------------------------------------------------------------------------
# Host-side (numpy) helpers used by the data layer and eval harness.
# ---------------------------------------------------------------------------

def img_coord_2_obj_coord(
    kp2d: np.ndarray, depth: np.ndarray, k: np.ndarray, pose_obj2cam: np.ndarray
) -> np.ndarray:
    """Lift 2D keypoints to object-frame 3D; utils/functions.py:35-51."""
    inv_k = np.linalg.inv(k[:3, :3])
    kp2d = kp2d[:, :2]
    kp2d_h = np.concatenate((kp2d, np.ones((kp2d.shape[0], 1))), 1)
    kp2d_int = np.round(kp2d_h).astype(int)[:, :2]
    kp_depth = depth[kp2d_int[:, 1], kp2d_int[:, 0]]
    kp2d_cam = np.expand_dims(kp_depth, 1) * kp2d_h
    kp3d_cam = np.dot(inv_k, kp2d_cam.T).T
    kp3d_cam_pad1 = np.concatenate(
        (kp3d_cam, np.ones((kp2d_cam.shape[0], 1))), 1
    ).T
    kp3d_obj = np.dot(np.linalg.inv(pose_obj2cam), kp3d_cam_pad1).T
    return kp3d_obj[:, :3]


def query_pose_error(
    pose_pred: np.ndarray, pose_gt: np.ndarray, unit: str = "m"
) -> Tuple[float, float]:
    """Angular (deg) + translation (cm) pose error; utils/functions.py:114-141."""
    if pose_pred.shape[0] == 4:
        pose_pred = pose_pred[:3]
    if pose_gt.shape[0] == 4:
        pose_gt = pose_gt[:3]
    scale = {"m": 100.0, "cm": 1.0, "mm": 0.1}[unit]
    translation_distance = np.linalg.norm(pose_pred[:, 3] - pose_gt[:, 3]) * scale
    rotation_diff = np.dot(pose_pred[:, :3], pose_gt[:, :3].T)
    trace = min(np.trace(rotation_diff), 3.0)
    angular_distance = np.rad2deg(np.arccos((trace - 1.0) / 2.0))
    return float(angular_distance), float(translation_distance)
