"""Visual-debug dumps to disk.

Parity target: utils/vis_utils.py — correspondence pair plots (:170),
depth-map plots (:269), cross-attention heatmap overlays (:313, also
dust3r/dust3r/model.py:36-97), tracking trajectory videos (:382). These are
the reference's manual-inspection hooks (SURVEY.md §4); numpy/NHWC inputs.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def _ensure_dir(d: str) -> None:
    os.makedirs(d, exist_ok=True)


def _to_uint8(img: np.ndarray) -> np.ndarray:
    img = np.asarray(img)
    lo, hi = img.min(), img.max()
    img = (img - lo) / (hi - lo + 1e-8)
    return (img * 255).astype(np.uint8)


def visualize_matching_pairs(
    image1: np.ndarray,
    image2: np.ndarray,
    kp1: np.ndarray,
    kp2: np.ndarray,
    epoch: int,
    batch_idx: int,
    output_dir: str = "visualization/debug_match",
    valid: Optional[np.ndarray] = None,
) -> str:
    """Side-by-side keypoint scatter (vis_utils.py:170-227)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(output_dir)
    fig, ax = plt.subplots(1, 2, figsize=(15, 5), dpi=100)
    ax[0].imshow(np.asarray(image1))
    ax[1].imshow(np.asarray(image2))
    for a in ax:
        a.axis("off")
    kp1 = np.asarray(kp1).reshape(-1, 2)
    kp2 = np.asarray(kp2).reshape(-1, 2)
    if valid is not None:
        kp1 = kp1[np.asarray(valid).reshape(-1)]
        kp2 = kp2[np.asarray(valid).reshape(-1)]
    # match pairs positionally: draw only the common prefix so unequal
    # paddings can't crash the scatter with a color/point length mismatch
    n = min(len(kp1), len(kp2))
    kp1, kp2 = kp1[:n], kp2[:n]
    colors = plt.cm.hsv(np.linspace(0, 1, max(n, 1)))
    ax[0].scatter(kp1[:, 0], kp1[:, 1], c=colors[:n], s=4)
    ax[1].scatter(kp2[:, 0], kp2[:, 1], c=colors[:n], s=4)
    fig.subplots_adjust(left=0, right=1, top=1, bottom=0, wspace=0)
    path = os.path.join(output_dir, f"match_epoch{epoch}_batch{batch_idx}.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def visualize_depth_maps(
    depth_pred_1: np.ndarray,
    depth_pred_2: np.ndarray,
    epoch: int,
    batch_idx: int,
    output_dir: str = "visualization/debug_depth",
) -> str:
    """Plasma depth panels with colorbars (vis_utils.py:269-310)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _ensure_dir(output_dir)
    fig, ax = plt.subplots(1, 2, figsize=(15, 5))
    for i, d in enumerate([depth_pred_1, depth_pred_2]):
        im = ax[i].imshow(np.asarray(d), cmap="plasma")
        ax[i].set_title(f"Depth Map {i + 1}")
        ax[i].axis("off")
        fig.colorbar(im, ax=ax[i], fraction=0.046, pad=0.04)
    path = os.path.join(output_dir, f"depth_epoch{epoch}_batch{batch_idx}.png")
    fig.savefig(path)
    plt.close(fig)
    return path


def vis_attn_map(
    attn_map: np.ndarray,
    img_target: np.ndarray,
    img_source: np.ndarray,
    count: int,
    p_size: int = 16,
    save_path: str = "visualization/camap",
    num_vis: int = 8,
    seed: int = 0,
) -> str:
    """Cross-attention heatmap overlays (dust3r/dust3r/model.py:36-97):
    pick random source patches, upsample their attention rows over the
    target image, JET-colormap overlay. attn_map (hw, hw), images NHWC."""
    import cv2

    _ensure_dir(save_path)
    H, W = img_target.shape[:2]
    pH, pW = H // p_size, W // p_size
    rng = np.random.RandomState(seed)
    src8 = _to_uint8(img_source)
    tgt8 = _to_uint8(img_target)

    rows = []
    for _ in range(num_vis):
        idx_h = rng.randint(pH)
        idx_w = rng.randint(pW)
        idx_n = idx_h * pW + idx_w
        marked = src8.copy()
        marked[idx_h * p_size : (idx_h + 1) * p_size,
               idx_w * p_size : (idx_w + 1) * p_size] = 255
        msk = np.asarray(attn_map[idx_n]).reshape(pH, pW)
        msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_LINEAR)
        msk = _to_uint8(msk)
        heat = cv2.applyColorMap(msk, cv2.COLORMAP_JET)
        overlay = _to_uint8(tgt8[..., ::-1].astype(np.int32) + heat)
        rows.append(np.concatenate([marked[:, :, ::-1], overlay], axis=1))
    out = np.concatenate(rows, axis=0)
    path = os.path.join(save_path, f"count{count}_all_points.jpg")
    cv2.imwrite(path, out)
    return path


def visualize_tracking_results(
    images: np.ndarray,
    trajectories_dict: Dict[int, np.ndarray],
    occlusions_dict: Dict[int, np.ndarray],
    save_dir: str,
) -> Sequence[str]:
    """Trajectory overlays per frame (vis_utils.py:382-...)."""
    import cv2

    _ensure_dir(save_dir)
    T = images.shape[0]
    paths = []
    for t in range(T):
        frame = _to_uint8(images[t])[:, :, ::-1].copy()
        for frame_idx, trajs in trajectories_dict.items():
            occ = occlusions_dict.get(frame_idx)
            for n in range(trajs.shape[0]):
                x, y = trajs[n, t]
                occluded = bool(occ[n, t]) if occ is not None else False
                color = (0, 0, 255) if occluded else (0, 255, 0)
                cv2.circle(frame, (int(x), int(y)), 3, color, -1)
        p = os.path.join(save_dir, f"frame_{t:04d}.jpg")
        cv2.imwrite(p, frame)
        paths.append(p)
    return paths
