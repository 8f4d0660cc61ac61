"""Objaverse rendering pair datasets (host-side, numpy).

Parity targets:
  - ObjaverseCorrDataset (ME): data_utils/dataset.py:32-99 — mask-derived 2D
    keypoints lifted to object-frame 3D via depth+pose, 3000 kps/view,
    random same-object pair; AugmentedDataset wrapper :102-165 with the 120
    deg view-angle filter.
  - ObjaverseMASt3RDataset: data_utils/dataset_mast3r_objaverse.py:29-117 —
    random same-object views, depth clamp to 5 m (/5000 normalization),
    MASt3R-format images.
  - ObjaverseVGGTDataset: data_utils/dataset_vggt_objaverse.py — same but
    emitting rgb_vggt via the 518/14 loader.

Renders live under root/<obj>/{color,depth,mask}_%06d.png (the offline
BlenderProc renderer layout, data_utils/blenderproc.py:13-87).
"""
from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import Dict, List, Optional

import cv2
import numpy as np

from gd3d.data.augment import color_augs_objaverse, shift_scale_rotate
from gd3d.data.images import load_image_mast3r, load_images_vggt
from gd3d.ops.geometry import img_coord_2_obj_coord

OBJAVERSE_INTRINSIC = np.array(
    [[35 * 512 / 32.0, 0.0, 256], [0.0, 35 * 512 / 32.0, 256], [0.0, 0.0, 1.0]]
)  # data_utils/dataset.py:38-40

MAST3R_INTRINSIC = np.array(
    [
        [16 * 512 / 32.0, 0, 256],
        [0, 16 * 512 * (384 / 512) / 32.0, 256 * (384 / 512)],
        [0, 0, 1],
    ]
)  # data_utils/dataset_mast3r_objaverse.py:35-42 (incl. its scale quirk)


def _read_rgb(path: Path) -> np.ndarray:
    img = cv2.imread(str(path))
    if img is None:
        raise FileNotFoundError(path)
    return img[..., ::-1].copy()


class ObjaverseCorrDataset:
    """ME pair sampler: returns pts2d/pts3d with fixed 3000 kps per view."""

    def __init__(self, root: str, obj_names: List[str], poses: np.ndarray,
                 num_kps: int = 3000, length: int = 100,
                 seed: Optional[int] = None):
        self.root = Path(root)
        self.obj_names = obj_names
        self.poses = poses
        self.num_kps = num_kps
        self.length = length
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.length

    def _view(self, obj_name: str, i: int, suffix: str) -> Dict:
        rgb = _read_rgb(self.root / obj_name / f"color_{i:06d}.png")
        depth = (
            cv2.imread(
                str(self.root / obj_name / f"depth_{i:06d}.png"),
                cv2.IMREAD_ANYDEPTH,
            ).astype(np.float64)
            / 1000.0
        )
        mask = cv2.imread(
            str(self.root / obj_name / f"mask_{i:06d}.png"), cv2.IMREAD_GRAYSCALE
        )
        kp2d = np.stack(np.where(mask > 0), -1)[:, ::-1]
        pose = self.poses[i]
        chosen = self.rng.choice(
            len(kp2d), self.num_kps, replace=len(kp2d) < self.num_kps
        )
        kp2d = kp2d[chosen]
        kp3d = img_coord_2_obj_coord(kp2d, depth, OBJAVERSE_INTRINSIC, pose)
        return {
            f"rgb_{suffix}": (rgb / 255.0).astype(np.float32),
            f"mask_{suffix}": mask > 0,
            f"pts2d_{suffix}": kp2d.astype(np.float32),
            f"pts3d_{suffix}": kp3d.astype(np.float32),
            f"rot_{suffix}": pose[:3, :3].astype(np.float32),
            f"pose_idx_{suffix}": i,
            f"obj_name_{suffix}": obj_name,
        }

    def __getitem__(self, idx) -> Dict:
        for _ in range(10):
            try:
                obj = self.rng.choice(self.obj_names)
                i = self.rng.choice(self.poses.shape[0])
                j = self.rng.choice(self.poses.shape[0])
                while j == i:
                    j = self.rng.choice(self.poses.shape[0])
                return {**self._view(obj, i, "1"), **self._view(obj, j, "2")}
            except Exception:
                continue  # skip-and-resample (dataset.py:92-95)
        raise RuntimeError("no loadable objaverse pair found")


class AugmentedCorrDataset:
    """AugmentedDataset (dataset.py:102-165): view-angle filter + augs."""

    def __init__(self, base: ObjaverseCorrDataset, geom_aug_prob: float = 0.5,
                 max_angle_deg: float = 120.0, seed: Optional[int] = None):
        self.base = base
        self.geom_aug_prob = geom_aug_prob
        self.max_angle = max_angle_deg
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx) -> Dict:
        # the reference resamples until the angle filter passes
        # (data_utils/dataset.py:131-133: self[(idx+1) % len]); a silent
        # fall-through would leak >max_angle pairs into the loss
        for attempt in range(200):
            data = self.base[idx]
            r1, r2 = data["rot_1"], data["rot_2"]
            cosang = np.clip((np.trace(r1 @ r2.T) - 1) / 2, -1.0, 1.0)
            if np.rad2deg(np.arccos(cosang)) <= self.max_angle:
                break
            if attempt % 20 == 19:  # try another object, as the ref does
                idx = (idx + 1) % len(self.base)
        else:
            raise RuntimeError(
                f"no view pair within {self.max_angle} deg after 200 tries")
        for v in ("1", "2"):
            img = (data[f"rgb_{v}"] * 255).astype(np.uint8)
            kps = data[f"pts2d_{v}"]
            mask = data[f"mask_{v}"]
            img, kps, mask = shift_scale_rotate(
                img, kps, mask, self.rng, p=self.geom_aug_prob
            )
            h, w = img.shape[:2]
            valid = (
                (kps[:, 0] >= 0) & (kps[:, 0] < w)
                & (kps[:, 1] >= 0) & (kps[:, 1] < h)
            )
            img = color_augs_objaverse(img, self.rng)
            if mask is not None:
                img = img * (mask > 0)[..., None].astype(img.dtype)
            data[f"rgb_{v}"] = (img / 255.0).astype(np.float32)
            data[f"mask_{v}"] = mask > 0 if mask is not None else None
            data[f"pts2d_{v}"] = kps.astype(np.float32)
            data[f"valid_{v}"] = valid
        return data


class ObjaverseMASt3RDataset:
    """MASt3R teacher pairs (dataset_mast3r_objaverse.py:29-117)."""

    def __init__(self, root: str, obj_names: List[str], length: int = 100,
                 seed: Optional[int] = None, vggt: bool = False):
        self.root = Path(root)
        self.obj_names = obj_names
        self.length = length
        self.vggt = vggt
        self.rng = np.random.RandomState(seed)
        self.max_idx = {o: self._max_idx(o) for o in obj_names}

    def _max_idx(self, obj: str) -> int:
        mx = 0
        for p in glob.glob(os.path.join(self.root, obj, "color_*.png")):
            mx = max(mx, int(p.split("_")[-1].split(".")[0]))
        return mx

    def __len__(self):
        return self.length

    def _view(self, obj: str, i: int, suffix: str) -> Dict:
        rgb_path = self.root / obj / f"color_{i:06d}.png"
        rgb = _read_rgb(rgb_path)
        depth = cv2.imread(
            str(self.root / obj / f"depth_{i:06d}.png"), cv2.IMREAD_UNCHANGED
        ).astype(np.float32)
        depth[depth == 0] = 5000
        depth[depth > 5000] = 5000
        return {
            f"rgb_{suffix}": (rgb / 255.0).astype(np.float32),
            f"rgb_path_{suffix}": str(rgb_path),
            f"depth_{suffix}": depth / 5000.0,
        }

    def __getitem__(self, idx) -> Dict:
        for _ in range(10):
            try:
                obj = self.rng.choice([o for o in self.obj_names
                                       if self.max_idx[o] > 1])
                i = self.rng.choice(self.max_idx[obj])
                j = self.rng.choice(self.max_idx[obj])
                while j == i:
                    j = self.rng.choice(self.max_idx[obj])
                res = {**self._view(obj, i, "1"), **self._view(obj, j, "2")}
                if self.vggt:
                    res["rgb_vggt"] = load_images_vggt(
                        [res["rgb_path_1"], res["rgb_path_2"]]
                    )
                else:
                    m1 = load_image_mast3r(res["rgb_path_1"], 512)
                    m2 = load_image_mast3r(res["rgb_path_2"], 512)
                    res["rgb_mast3r_1"] = m1["img"]
                    res["rgb_mast3r_2"] = m2["img"]
                    res["true_shape"] = m1["true_shape"]
                res["intrinsic"] = MAST3R_INTRINSIC.astype(np.float32)
                return res
            except Exception:
                continue
        raise RuntimeError("no loadable objaverse pair found")


class AugmentedObjaverseDataset:
    """Color-only augs on rgb_1/rgb_2 (dataset_mast3r_objaverse.py:121-152)."""

    def __init__(self, base, seed: Optional[int] = None):
        self.base = base
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.base)

    def __getitem__(self, idx):
        data = self.base[idx]
        for v in ("1", "2"):
            img = (data[f"rgb_{v}"] * 255).astype(np.uint8)
            img = color_augs_objaverse(img, self.rng)
            data[f"rgb_{v}"] = (img / 255.0).astype(np.float32)
        return data
