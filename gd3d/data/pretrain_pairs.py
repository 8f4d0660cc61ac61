"""Synthetic two-view pretraining pairs with dense ground truth.

The DUSt3R/MASt3R pretraining criteria (gd3d/distill/pretrain.py) need what
the reference's pretraining datasets provide — per-pixel world pointmaps,
validity/sky masks, cam2world poses and pixel correspondences
(dust3r/datasets' view dicts; the reference vendors the datasets but strips
the driver). This builds them from gd3d's own procedural renderer
(gd3d/data/render_synthetic.py): render depth for two poses, unproject to
world pointmaps, mark background as sky, and project shared mesh vertices
(z-buffer visibility-checked) into both views as correspondences.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from gd3d.data.render_synthetic import (
    DEFAULT_INTRINSIC,
    fixed_poses,
    procedural_object,
    render_mesh,
)


def _unproject_world(depth: np.ndarray, K: np.ndarray,
                     E: np.ndarray) -> np.ndarray:
    """depth (H, W) + world2cam E -> world-frame pointmap (H, W, 3)."""
    H, W = depth.shape
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5)
    rays = np.stack([u, v, np.ones_like(u)], -1) @ np.linalg.inv(K).T
    cam = rays * depth[..., None]
    R, t = E[:3, :3], E[:3, 3]
    return (cam - t) @ R  # R^-1 = R^T applied row-wise


def synthetic_pretrain_batch(
    seed: int,
    batch: int = 1,
    img: int = 64,
    n_corres: int = 64,
) -> Dict[str, np.ndarray]:
    """Batch for build_mast3r_pretrain_step: img1/img2 in [-1, 1] plus
    gt1/gt2 dicts (camera_pose cam2world, world pts3d, valid/sky masks,
    padded pixel correspondences with a validity mask)."""
    rng = np.random.RandomState(seed)
    K = DEFAULT_INTRINSIC * (img / 512.0)
    K[2, 2] = 1.0
    poses_all = fixed_poses(42)

    out = {"img1": [], "img2": []}
    gts: Dict[int, Dict[str, list]] = {
        1: {k: [] for k in ("camera_pose", "pts3d", "valid_mask",
                            "sky_mask", "corres")},
        2: {k: [] for k in ("camera_pose", "pts3d", "valid_mask",
                            "sky_mask", "corres")},
    }
    valid_corres = []
    for b in range(batch):
        verts, faces, colors = procedural_object(
            np.random.RandomState(seed * 1000 + b))
        i, j = rng.choice(len(poses_all), 2, replace=False)
        views = []
        for vi, E in enumerate((poses_all[i], poses_all[j])):
            rgb, depth, mask = render_mesh(verts, faces, colors, E, K, img)
            pts3d = _unproject_world(depth, K, E)
            views.append((E, rgb, depth, mask, pts3d))
            out[f"img{vi + 1}"].append(
                rgb.astype(np.float32) / 255.0 * 2.0 - 1.0)
            g = gts[vi + 1]
            g["camera_pose"].append(np.linalg.inv(E).astype(np.float32))
            g["pts3d"].append(pts3d.astype(np.float32))
            g["valid_mask"].append(mask)
            g["sky_mask"].append(~mask)  # background plays the sky role

        # correspondences: mesh vertices visible (z-buffer) in BOTH views
        sel = rng.choice(len(verts), min(4 * n_corres, len(verts)),
                         replace=False)
        uvs, vis = [], []
        for E, _rgb, depth, mask, _p in views:
            cam = verts[sel] @ E[:3, :3].T + E[:3, 3]
            uv = cam @ K.T
            uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-8)
            ui = np.clip(uv.astype(np.int64), 0, img - 1)
            inb = ((uv[:, 0] >= 0) & (uv[:, 0] < img)
                   & (uv[:, 1] >= 0) & (uv[:, 1] < img))
            zbuf = depth[ui[:, 1], ui[:, 0]]
            ok = inb & (np.abs(cam[:, 2] - zbuf) < 0.02) & (zbuf > 0)
            uvs.append(ui)
            vis.append(ok)
        both = vis[0] & vis[1]
        order = np.argsort(~both)  # visible-in-both first
        take = order[:n_corres]
        vc = both[take]
        if len(take) < n_corres:  # pad (marked invalid)
            pad = n_corres - len(take)
            take = np.concatenate([take, np.zeros(pad, np.int64)])
            vc = np.concatenate([vc, np.zeros(pad, bool)])
        gts[1]["corres"].append(uvs[0][take])
        gts[2]["corres"].append(uvs[1][take])
        valid_corres.append(vc)

    batch_out: Dict[str, np.ndarray] = {
        "img1": np.stack(out["img1"]),
        "img2": np.stack(out["img2"]),
    }
    for vi in (1, 2):
        batch_out[f"gt{vi}"] = {
            k: np.stack(v) for k, v in gts[vi].items()}
    batch_out["gt1"]["valid_corres"] = np.stack(valid_corres)
    batch_out["gt1"]["is_metric_scale"] = np.zeros((batch,), bool)
    return batch_out
