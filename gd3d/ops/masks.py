"""Patch-occupancy masks and masked/normalized cost volumes.

Parity targets: utils/functions.py:375-399 (get_patch_mask_from_kp_tensor)
and :402-422 (get_masked_patch_cost).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def patch_mask_from_kps(
    kp_xy: jnp.ndarray,
    H: int,
    W: int,
    patch_size: int,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Boolean (ph*pw,) mask of patches containing at least one keypoint.

    Matches utils/functions.py:375-399. `valid` masks padded keypoint slots.
    """
    ph, pw = H // patch_size, W // patch_size
    num_patches = ph * pw
    # bound by the PATCH GRID, not (H, W): when H/W are not multiples of
    # patch_size, keypoints in the residual border band would map to
    # patch_idx >= ph*pw and be silently dropped by the scatter
    in_bounds = (
        (kp_xy[:, 0] >= 0)
        & (kp_xy[:, 0] < pw * patch_size)
        & (kp_xy[:, 1] >= 0)
        & (kp_xy[:, 1] < ph * patch_size)
    )
    if valid is not None:
        in_bounds = in_bounds & valid
    x_idx = jnp.clip(kp_xy[:, 0], 0, W - 1).astype(jnp.int32) // patch_size
    y_idx = jnp.clip(kp_xy[:, 1], 0, H - 1).astype(jnp.int32) // patch_size
    patch_idx = jnp.where(in_bounds, y_idx * pw + x_idx, num_patches)
    mask = jnp.zeros((num_patches + 1,), bool).at[patch_idx].max(in_bounds)
    return mask[:num_patches]


def masked_patch_cost(
    cost: jnp.ndarray,
    mask_patch_1: jnp.ndarray,
    mask_patch_2: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
    use_softmax: bool = False,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """Zero rows outside mask_patch_1 then row-normalize (or softmax).

    Matches utils/functions.py:402-422 including its quirk: when mask_patch_2
    is None the 2-D mask is mask1[:, None] * ones[None, :], i.e. pure row
    masking. With use_softmax, zeroed rows become uniform (torch softmax of a
    constant row); without, they normalize to all-zero rows (sum clamped to
    eps). Softmax is computed in float32 like the reference.
    """
    B, hw, hw2 = cost.shape
    if mask_patch_2 is not None:
        mask_2d = mask_patch_1[:, None] & mask_patch_2[None, :]
    else:
        mask_2d = jnp.broadcast_to(mask_patch_1[:, None], (hw, hw2))
    mask_2d = jnp.broadcast_to(mask_2d[None], (B, hw, hw2))

    masked = jnp.where(mask_2d, cost, 0.0)
    if use_softmax:
        out = _softmax_f32(masked, temperature)
    else:
        row_sum = jnp.maximum(jnp.sum(masked, axis=-1, keepdims=True), eps)
        out = masked / row_sum
    return out


def _softmax_f32(x: jnp.ndarray, temperature: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32) / temperature
    x32 = x32 - jnp.max(x32, axis=-1, keepdims=True)
    e = jnp.exp(x32)
    return e / jnp.sum(e, axis=-1, keepdims=True)
