"""Image augmentations matching the reference's albumentations pipelines.

albumentations is not in this image, so the transforms are reimplemented
with cv2/numpy:
  - color set A (objaverse ME/MASt3R, data_utils/dataset.py:112-118):
    GaussianBlur, ISO/Gauss noise, CLAHE, RandomBrightnessContrast
  - color set B (scannetpp, dataset_mast3r_scannetpp.py:189-193):
    ColorJitter(0.2/0.2/0.2/0.1) + GaussianBlur
  - geometric (ME objaverse, dataset.py:119-121): ShiftScaleRotate
    (limits 0.25/0.25/45deg, p=0.5, zero border) applied to image, mask and
    keypoints together.
"""
from __future__ import annotations

from typing import Optional, Tuple

import cv2
import numpy as np


def gaussian_blur(img: np.ndarray, rng: np.random.RandomState,
                  blur_limit=(1, 3)) -> np.ndarray:
    k = int(rng.randint(blur_limit[0], blur_limit[1] + 1))
    if k % 2 == 0:
        k += 1
    if k <= 1:
        return img
    return cv2.GaussianBlur(img, (k, k), 0)


def gauss_noise(img: np.ndarray, rng: np.random.RandomState,
                var_limit=(10.0, 50.0)) -> np.ndarray:
    var = rng.uniform(*var_limit)
    noise = rng.normal(0, var**0.5, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)


def clahe(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    c = cv2.createCLAHE(clipLimit=rng.uniform(1.0, 4.0), tileGridSize=(8, 8))
    lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
    lab[..., 0] = c.apply(lab[..., 0])
    return cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)


def brightness_contrast(img: np.ndarray, rng: np.random.RandomState,
                        limit=0.2) -> np.ndarray:
    alpha = 1.0 + rng.uniform(-limit, limit)
    beta = rng.uniform(-limit, limit) * 255
    return np.clip(img.astype(np.float32) * alpha + beta, 0, 255).astype(np.uint8)


def color_jitter(img: np.ndarray, rng: np.random.RandomState,
                 brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1):
    out = img.astype(np.float32) / 255.0
    b = 1.0 + rng.uniform(-brightness, brightness)
    out = np.clip(out * b, 0, 1)
    c = 1.0 + rng.uniform(-contrast, contrast)
    mean = out.mean()
    out = np.clip((out - mean) * c + mean, 0, 1)
    hsv = cv2.cvtColor((out * 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
        np.float32
    )
    s = 1.0 + rng.uniform(-saturation, saturation)
    hsv[..., 1] = np.clip(hsv[..., 1] * s, 0, 255)
    h = rng.uniform(-hue, hue) * 180
    hsv[..., 0] = (hsv[..., 0] + h) % 180
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def color_augs_objaverse(img: np.ndarray, rng: np.random.RandomState,
                         p: float = 0.5) -> np.ndarray:
    """uint8 RGB in, uint8 RGB out (dataset.py:112-118 set)."""
    if rng.rand() < p:
        img = gaussian_blur(img, rng)
    if rng.rand() < p:
        img = gauss_noise(img, rng)
    if rng.rand() < p:
        img = clahe(img, rng)
    if rng.rand() < p:
        img = brightness_contrast(img, rng)
    return img


def color_augs_scannetpp(img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
    img = color_jitter(img, rng)
    return gaussian_blur(img, rng, blur_limit=(3, 7))


def shift_scale_rotate(
    img: np.ndarray,
    kps: np.ndarray,
    mask: Optional[np.ndarray],
    rng: np.random.RandomState,
    shift_limit: float = 0.25,
    scale_limit: float = 0.25,
    rotate_limit: float = 45.0,
    p: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """A.ShiftScaleRotate equivalent with keypoint transport, zero border."""
    if rng.rand() >= p:
        return img, kps, mask
    h, w = img.shape[:2]
    angle = rng.uniform(-rotate_limit, rotate_limit)
    scale = 1.0 + rng.uniform(-scale_limit, scale_limit)
    dx = rng.uniform(-shift_limit, shift_limit) * w
    dy = rng.uniform(-shift_limit, shift_limit) * h
    M = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
    M[0, 2] += dx
    M[1, 2] += dy
    img_out = cv2.warpAffine(
        img, M, (w, h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    mask_out = None
    if mask is not None:
        mask_out = cv2.warpAffine(
            mask.astype(np.uint8), M, (w, h), flags=cv2.INTER_NEAREST,
            borderMode=cv2.BORDER_CONSTANT, borderValue=0,
        )
    ones = np.ones((kps.shape[0], 1), kps.dtype)
    kps_out = np.concatenate([kps[:, :2], ones], axis=1) @ M.T
    return img_out, kps_out.astype(np.float32), mask_out
