"""Bilinear keypoint-feature interpolation with patch-center alignment.

Behavioral parity target: utils/functions.py:55-76 (interpolate_features),
which maps pixel keypoints through an affine transform accounting for the
patch grid's half-patch offset, then torch.grid_sample(align_corners=True,
padding_mode='border').

TPU-first notes: the gather is expressed channels-last so XLA vectorizes the
4-tap blend on the VPU; everything is static-shaped and vmappable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gd3d.ops.basic import l2_normalize


def grid_sample_bilinear(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample `img` (C, H, W) at normalized coords (N, 2) in [-1, 1].

    Matches torch.nn.functional.grid_sample(align_corners=True,
    padding_mode='border') for in/out-of-range points: pixel index
    p = (c + 1) / 2 * (size - 1), taps clamped to the image border.
    Returns (C, N).
    """
    C, H, W = img.shape
    x = (coords[:, 0] + 1.0) * 0.5 * (W - 1)
    y = (coords[:, 1] + 1.0) * 0.5 * (H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def tap(yi, xi):
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return img[:, yi, xi]  # (C, N)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)

    top = v00 * (1.0 - tx) + v01 * tx
    bot = v10 * (1.0 - tx) + v11 * tx
    return top * (1.0 - ty) + bot * ty


def interpolate_features(
    descriptors: jnp.ndarray,
    pts: jnp.ndarray,
    h: int,
    w: int,
    normalize: bool = True,
    patch_size: int = 14,
    stride: int = 14,
) -> jnp.ndarray:
    """Sample per-keypoint features from a patch-feature map.

    Args:
      descriptors: (B, C, ph, pw) patch features.
      pts: (B, N, 2) keypoints in (x, y) pixel coords of the h x w image.
      h, w: pixel size of the image the patch grid was computed from.
      patch_size, stride: patch embed geometry.

    The affine map places patch centers at patch_size/2 + k*stride
    (utils/functions.py:56-65), so keypoint (patch_size/2, patch_size/2)
    lands exactly on grid node (0, 0).

    Returns (B, C, N), L2-normalized over C when `normalize`.
    """
    last_coord_h = ((h - patch_size) // stride) * stride + (patch_size / 2)
    last_coord_w = ((w - patch_size) // stride) * stride + (patch_size / 2)
    ah = 2.0 / (last_coord_h - (patch_size / 2))
    aw = 2.0 / (last_coord_w - (patch_size / 2))
    bh = 1.0 - last_coord_h * 2.0 / (last_coord_h - (patch_size / 2))
    bw = 1.0 - last_coord_w * 2.0 / (last_coord_w - (patch_size / 2))

    a = jnp.asarray([aw, ah], dtype=pts.dtype)
    b = jnp.asarray([bw, bh], dtype=pts.dtype)
    coords = a * pts + b  # (B, N, 2) in [-1, 1]

    out = jax.vmap(grid_sample_bilinear)(descriptors, coords)  # (B, C, N)
    if normalize:
        out = l2_normalize(out, axis=1)
    return out
