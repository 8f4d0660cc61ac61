"""Procedural pair batches for tests, smoke training and benchmarking.

Geometry mirrors the Objaverse rendering setup (fixed intrinsics, object in
front of the camera, two views of the same object — data_utils/dataset.py:
32-99) without needing rendered assets: random 3D surface points, two camera
poses, projected keypoints, noise images. Used by the dev-mode smoke run
(the analogue of src/main.py:100-102 limit_batches=2) and bench.py.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def _look_at_pose(rng: np.random.RandomState) -> np.ndarray:
    """Random small rotation + translation putting the object ~2m away."""
    angles = rng.uniform(-0.4, 0.4, size=3)
    cx, cy, cz = np.cos(angles)
    sx, sy, sz = np.sin(angles)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = Rz @ Ry @ Rx
    t = np.array([0.0, 0.0, 2.0]) + rng.uniform(-0.1, 0.1, size=3)
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = t
    return E


def synthetic_me_batch(
    seed: int,
    batch: int = 1,
    img: int = 64,
    n_kps: int = 128,
) -> Dict[str, np.ndarray]:
    """Batch in the format of ObjaverseCorrDataset pairs
    (data_utils/dataset.py:74-95): two views, 2D keypoints, shared-frame 3D
    keypoints (positives are co-located 3D points)."""
    rng = np.random.RandomState(seed)
    f = 1.2 * img
    K = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]])

    out = {
        "rgb_1": [], "rgb_2": [],
        "pts2d_1": [], "pts2d_2": [],
        "pts3d_1": [], "pts3d_2": [],
        "valid_1": [], "valid_2": [],
    }
    for _ in range(batch):
        obj = rng.randn(n_kps, 3) * 0.15  # object-frame points
        views = []
        for _v in range(2):
            E = _look_at_pose(rng)
            cam = obj @ E[:3, :3].T + E[:3, 3]
            uv = (cam @ K.T)
            uv = uv[:, :2] / uv[:, 2:3]
            valid = (
                (uv[:, 0] >= 1) & (uv[:, 0] < img - 1)
                & (uv[:, 1] >= 1) & (uv[:, 1] < img - 1)
            )
            uv = np.clip(uv, 1, img - 2)
            views.append((uv, valid))
        (uv1, v1), (uv2, v2) = views
        out["rgb_1"].append(rng.rand(img, img, 3).astype(np.float32))
        out["rgb_2"].append(rng.rand(img, img, 3).astype(np.float32))
        out["pts2d_1"].append(uv1.astype(np.float32))
        out["pts2d_2"].append(uv2.astype(np.float32))
        out["pts3d_1"].append(obj.astype(np.float32))
        out["pts3d_2"].append(obj.astype(np.float32))
        out["valid_1"].append(v1)
        out["valid_2"].append(v2)
    return {k: np.stack(v) for k, v in out.items()}
