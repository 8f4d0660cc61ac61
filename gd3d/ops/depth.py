"""Depth-map post-processing: morphology, hole filling, edge-aware smoothing.

Parity target: utils/functions.py:262-345 (post_process_depth), which chains
torch max-pool morphology, two conv-based hole-filling passes, and kornia
median / bilateral / guided / joint-bilateral filters. kornia is not a
dependency here — the filters are reimplemented in jnp with kornia's padding
conventions (reflect padding; even kernels pad (k-1)//2 front, rest rear).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad2d(x: jnp.ndarray, k: int, mode: str) -> jnp.ndarray:
    front = (k - 1) // 2
    rear = (k - 1) - front
    return jnp.pad(x, ((front, rear), (front, rear)), mode=mode)


def _windows(x: jnp.ndarray, k: int, mode: str = "reflect") -> jnp.ndarray:
    """(k*k, H, W) stack of shifted views of reflect-padded x."""
    H, W = x.shape
    p = _pad2d(x, k, mode)
    return jnp.stack(
        [p[dy : dy + H, dx : dx + W] for dy in range(k) for dx in range(k)], 0
    )


def _window_sum(x: jnp.ndarray, k: int, mode: str) -> jnp.ndarray:
    """Sum over k x k windows via reduce_window — identical to summing the
    _windows stack but without materializing (k*k, H, W) in HBM (the r=8
    guided filter would stack 64 shifted copies per box filter otherwise)."""
    p = _pad2d(x, k, mode)
    return jax.lax.reduce_window(
        p, 0.0, jax.lax.add, (k, k), (1, 1), "VALID"
    )


def _box_filter(x: jnp.ndarray, k: int, mode: str = "reflect") -> jnp.ndarray:
    return _window_sum(x, k, mode) / float(k * k)


def _conv_ones(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """F.conv2d with an all-ones k x k kernel, zero 'same' padding."""
    return _window_sum(x, k, mode="constant")


def median_blur(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """kornia.filters.median_blur: reflect pad, window median."""
    return jnp.median(_windows(x, k), axis=0)


def _gaussian_kernel1d(k: int, sigma: float) -> jnp.ndarray:
    half = (k - 1) / 2.0
    xs = jnp.arange(k, dtype=jnp.float32) - half
    g = jnp.exp(-0.5 * (xs / sigma) ** 2)
    return g / jnp.sum(g)


def _space_kernel(k: int, sigma: float) -> jnp.ndarray:
    g = _gaussian_kernel1d(k, sigma)
    return (g[:, None] * g[None, :]).reshape(-1)  # (k*k,)


def joint_bilateral_blur(
    inp: jnp.ndarray,
    guide: jnp.ndarray,
    k: int,
    sigma_color: float,
    sigma_space: float,
) -> jnp.ndarray:
    """kornia joint_bilateral_blur: range kernel from the guide image."""
    wins = _windows(inp, k)            # (k*k, H, W)
    gwin = _windows(guide, k)
    diff = gwin - guide[None]
    color_w = jnp.exp(-0.5 * (diff / sigma_color) ** 2)
    space_w = _space_kernel(k, sigma_space)[:, None, None]
    w = color_w * space_w
    return jnp.sum(w * wins, axis=0) / (jnp.sum(w, axis=0) + 1e-12)


def bilateral_blur(
    x: jnp.ndarray, k: int, sigma_color: float, sigma_space: float
) -> jnp.ndarray:
    return joint_bilateral_blur(x, x, k, sigma_color, sigma_space)


def guided_blur(
    guidance: jnp.ndarray, inp: jnp.ndarray, k: int, eps: float
) -> jnp.ndarray:
    """kornia guided_blur(guidance, input, kernel_size, eps) — guided filter."""
    mean_I = _box_filter(guidance, k)
    mean_p = _box_filter(inp, k)
    corr_Ip = _box_filter(guidance * inp, k)
    var_I = _box_filter(guidance * guidance, k) - mean_I * mean_I
    cov_Ip = corr_Ip - mean_I * mean_p
    a = cov_Ip / (var_I + eps)
    b = mean_p - a * mean_I
    return _box_filter(a, k) * guidance + _box_filter(b, k)


def _dilate(x: jnp.ndarray, k: int) -> jnp.ndarray:
    pad = k // 2
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (k, k), (1, 1), ((pad, pad), (pad, pad))
    )


def _erode(x: jnp.ndarray, k: int) -> jnp.ndarray:
    pad = k // 2
    return jax.lax.reduce_window(
        x, jnp.inf, jax.lax.min, (k, k), (1, 1), ((pad, pad), (pad, pad))
    )


def _fill_holes(depth: jnp.ndarray, k: int) -> jnp.ndarray:
    """One neighborhood-average hole-fill pass (utils/functions.py:286-312)."""
    valid = (depth > 0).astype(depth.dtype)
    expanded = (_conv_ones(valid, k) > 0).astype(depth.dtype)
    dist_w = _conv_ones(valid, k)
    value_prop = _conv_ones(depth * valid, k)
    normalized = value_prop / (dist_w + 1e-8)
    fill = jnp.clip(expanded - valid, 0.0, 1.0)
    return depth * valid + normalized * fill


def post_process_depth(
    depth_img: jnp.ndarray,
    kernel_size: int = 3,
    bilateral_d: int = 3,
    bilateral_sigma_color: float = 0.1,
    bilateral_sigma_space: float = 1.0,
    guided_r: int = 8,
    guided_eps: float = 1e-2,
) -> jnp.ndarray:
    """Full reference chain (utils/functions.py:262-345). (H, W) -> (H, W).

    Close (dilate+erode) -> two hole-fill passes (5 then 7) -> median ->
    bilateral -> guided (guidance = bilateral output, input = median clone,
    matching the reference's kornia call) -> 3-sigma outlier replacement ->
    joint bilateral against the median guide.

    The reference skips hole-filling when no pixel is empty
    (`empty_mask.sum() > 0` branch); the fill is identity on dense maps, so we
    apply it unconditionally to stay jit-friendly.
    """
    d = depth_img.reshape(depth_img.shape[-2:]).astype(jnp.float32)

    dilated = _dilate(d, kernel_size)
    eroded = _erode(dilated, kernel_size)

    # hole filling: first valid>1e-5 style gate via (eroded < 1e-5) mask
    valid0 = (eroded >= 1e-5).astype(d.dtype)
    eroded = eroded * valid0
    eroded = _fill_holes(eroded, 5)
    eroded = _fill_holes(eroded, 7)

    depth_median = median_blur(eroded, kernel_size)
    guide_img = depth_median
    depth_bilateral = bilateral_blur(
        depth_median, bilateral_d, bilateral_sigma_color, bilateral_sigma_space
    )
    depth_guided = guided_blur(depth_bilateral, guide_img, guided_r, guided_eps)

    local_mean = _box_filter(depth_guided, kernel_size, mode="constant")
    local_sq = _box_filter(depth_guided**2, kernel_size, mode="constant")
    local_var = local_sq - local_mean**2
    local_std = jnp.sqrt(jnp.clip(local_var, 1e-6, None))
    outlier = (jnp.abs(depth_guided - local_mean) > 3.0 * local_std).astype(d.dtype)
    depth_filtered = depth_guided * (1.0 - outlier) + depth_median * outlier

    depth_final = joint_bilateral_blur(
        depth_filtered,
        guide_img,
        bilateral_d,
        bilateral_sigma_color / 2.0,
        bilateral_sigma_space,
    )
    return depth_final
