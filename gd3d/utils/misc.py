"""Miscellaneous utilities ported for API completeness.

Parity targets in utils/functions.py: resize_crop (:78-93), parse_yaml
(:96-111), rotation_angle_from_matrix (:210-213).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import yaml


def parse_yaml(file_path: str) -> dict:
    with open(file_path, "r") as f:
        return yaml.safe_load(f)


def rotation_angle_from_matrix(R) -> float:
    """Geodesic rotation angle (radians) from a 3x3 rotation matrix."""
    trace = float(np.trace(np.asarray(R)))
    return float(np.arccos(np.clip((trace - 1.0) / 2.0, -1.0, 1.0)))


def resize_crop(
    img: np.ndarray,
    padding: float = 0.2,
    out_size: int = 224,
    bbox: Optional[Tuple[int, int, int, int]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bbox-centered square crop+resize with the 3x3 pixel transform
    (utils/functions.py:78-93)."""
    from PIL import Image

    pil = Image.fromarray(img)
    if bbox is None:
        bbox = pil.getbbox()
    width = bbox[2] - bbox[0]
    height = bbox[3] - bbox[1]
    size = max(height, width) * (1 + padding)
    center = ((bbox[2] + bbox[0]) / 2, (bbox[3] + bbox[1]) / 2)
    left = center[0] - size / 2
    top = center[1] - size / 2
    cropped = pil.crop((left, top, left + size, top + size)).resize(
        (out_size, out_size)
    )
    transform = (
        np.array([[1, 0, center[0]], [0, 1, center[1]], [0, 0, 1.0]])
        @ np.array([[size / out_size, 0, 0], [0, size / out_size, 0], [0, 0, 1]])
        @ np.array([[1, 0, -out_size / 2], [0, 1, -out_size / 2], [0, 0, 1.0]])
    )
    return np.array(cropped), transform
