"""DINO-Tracker-style feature-volume tracker, batched TPU-first.

Parity target: utils/tracking_model.py — per query point, correlation maps
against every frame's dense features, ReLU + softmax, radius-35 circular
mask around the hard argmax on the patch-center pixel grid, soft-argmax
(TrackerHead :121-200); trajectory features -> cosine-similarity gating;
T x T anchor (cycle) trajectories; occlusion from median anchor distance +
cosine thresholds (ModelInference :453-594).

The reference loops python-side per query point and per anchor frame (the
eval wall-clock hog, SURVEY.md §5); here everything is batched einsums:
trajectories for ALL (query, frame) pairs in one shot, anchor cycles as one
(T x T) batch per query under lax.map.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    patch_size: int = 16
    stride: int = 8
    argmax_radius: int = 35
    anchor_cos_threshold: float = 0.7
    cos_threshold: float = 0.6
    video_h: int = 464
    video_w: int = 848


def _patch_center_grid(cfg: TrackerConfig, gh: int, gw: int) -> jnp.ndarray:
    """(gh, gw, 2) pixel (x, y) coords of patch centers
    (tracking_model.py:147-160: start at patch/2, step stride)."""
    h0 = cfg.patch_size // 2
    w0 = cfg.patch_size // 2
    ys = h0 + jnp.arange(gh) * cfg.stride
    xs = w0 + jnp.arange(gw) * cfg.stride
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1).astype(jnp.float32)


def _normalize_points(cfg: TrackerConfig, pts_xy: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> [-1,1] grid coords with patch-center alignment
    (tracking_model.py:240-266, same affine as interpolate_features)."""
    h, w, ps, st = cfg.video_h, cfg.video_w, cfg.patch_size, cfg.stride
    last_h = ((h - ps) // st) * st + ps / 2
    last_w = ((w - ps) // st) * st + ps / 2
    ah = 2 / (last_h - ps / 2)
    aw = 2 / (last_w - ps / 2)
    bh = 1 - last_h * 2 / (last_h - ps / 2)
    bw = 1 - last_w * 2 / (last_w - ps / 2)
    return pts_xy * jnp.asarray([aw, ah]) + jnp.asarray([bw, bh])


def _sample_embed(features: jnp.ndarray, pts_xyt: jnp.ndarray,
                  cfg: TrackerConfig) -> jnp.ndarray:
    """features (T, gh, gw, C); pts (N, 3) as (x, y, t) pixels -> (N, C)."""
    T, gh, gw, C = features.shape
    norm = _normalize_points(cfg, pts_xyt[:, :2])
    x = (norm[:, 0] + 1) * 0.5 * (gw - 1)
    y = (norm[:, 1] + 1) * 0.5 * (gh - 1)
    t = jnp.clip(jnp.round(pts_xyt[:, 2]).astype(jnp.int32), 0, T - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[:, None]
    ty = (y - y0)[:, None]

    def tap(yi, xi):
        yi = jnp.clip(yi, 0, gh - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, gw - 1).astype(jnp.int32)
        return features[t, yi, xi]  # (N, C)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (v00 * (1 - tx) + v01 * tx) * (1 - ty) + (
        v10 * (1 - tx) + v11 * tx
    ) * ty


def _soft_argmax_batch(corr: jnp.ndarray, grid: jnp.ndarray,
                       cfg: TrackerConfig) -> jnp.ndarray:
    """corr (..., gh, gw) cosine maps -> (..., 2) pixel coords.

    ReLU -> softmax over the map -> circular radius mask at the hard argmax
    patch center -> weighted mean of patch-center coords
    (tracking_model.py:147-200 incl. the uniform fallback for empty masks).
    """
    gh, gw = corr.shape[-2:]
    flat = jnp.maximum(corr, 0.0).reshape(*corr.shape[:-2], gh * gw)
    am = jnp.argmax(flat, axis=-1)
    sm = jax.nn.softmax(flat, axis=-1).reshape(*corr.shape[:-2], gh, gw)

    row = am // gw
    col = am % gw
    h0 = cfg.patch_size // 2
    center = jnp.stack(
        [col * cfg.stride + h0, row * cfg.stride + h0], axis=-1
    ).astype(jnp.float32)  # (..., 2) (x, y)

    d = jnp.linalg.norm(grid - center[..., None, None, :], axis=-1)
    mask = (d <= cfg.argmax_radius).astype(sm.dtype)
    hm = sm * mask
    hm_sum = jnp.sum(hm, axis=(-1, -2))
    # numerical-stability fallback: uniform over the mask
    uniform = mask / jnp.maximum(jnp.sum(mask, axis=(-1, -2), keepdims=True), 1.0)
    hm = jnp.where((hm_sum < 1e-8)[..., None, None], uniform, hm)
    hm_sum = jnp.sum(hm, axis=(-1, -2))
    pt = jnp.sum(grid * hm[..., None], axis=(-3, -2)) / hm_sum[..., None]
    return pt


@partial(jax.jit, static_argnames=("cfg",))
def generate_trajectories(
    features: jnp.ndarray, query_points: jnp.ndarray, cfg: TrackerConfig
) -> jnp.ndarray:
    """features (T, gh, gw, C) (refine_conv applied); query (N, 3) (x, y, t)
    pixels. Returns (N, T, 2) predicted pixel coords for every frame."""
    T, gh, gw, C = features.shape
    grid = _patch_center_grid(cfg, gh, gw)
    e = _sample_embed(features, query_points, cfg)  # (N, C)

    fnorm = jnp.linalg.norm(features, axis=-1)  # (T, gh, gw)
    enorm = jnp.linalg.norm(e, axis=-1)  # (N,)
    corr = jnp.einsum("nc,tghc->ntgh", e, features)
    corr = corr / jnp.maximum(enorm[:, None, None, None] * fnorm[None], EPS)
    return _soft_argmax_batch(corr, grid, cfg)  # (N, T, 2)


@partial(jax.jit, static_argnames=("cfg",))
def trajectory_cos_sims(
    features: jnp.ndarray, trajectories: jnp.ndarray, query_points: jnp.ndarray,
    cfg: TrackerConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine sim of each trajectory point's feature vs its query-frame
    feature (tracking_model.py:484-501). Returns (cos (N, T), traj feats)."""
    T = features.shape[0]
    N = trajectories.shape[0]
    ts = jnp.broadcast_to(jnp.arange(T, dtype=jnp.float32), (N, T))
    pts = jnp.concatenate([trajectories, ts[..., None]], axis=-1).reshape(-1, 3)
    tf = _sample_embed(features, pts, cfg).reshape(N, T, -1)
    qframe = jnp.clip(query_points[:, 2].astype(jnp.int32), 0, T - 1)
    qf = tf[jnp.arange(N), qframe]  # (N, C)
    cos = jnp.sum(tf * qf[:, None], -1) / jnp.maximum(
        jnp.linalg.norm(tf, axis=-1) * jnp.linalg.norm(qf, axis=-1)[:, None], EPS
    )
    return cos, tf


@partial(jax.jit, static_argnames=("cfg",))
def anchor_trajectories(
    features: jnp.ndarray, trajectories: jnp.ndarray, cfg: TrackerConfig
) -> jnp.ndarray:
    """Cycle predictions: track trajectory point (n, t) to EVERY frame a.
    Returns (N, T_anchor, T_source, 2) — the reference's per-anchor loop
    (tracking_model.py:505-540) computed for all frames, masked later."""
    T, gh, gw, C = features.shape
    grid = _patch_center_grid(cfg, gh, gw)
    fnorm = jnp.linalg.norm(features, axis=-1)

    def per_query(traj):
        ts = jnp.arange(T, dtype=jnp.float32)[:, None]
        pts = jnp.concatenate([traj, ts], axis=-1)  # (T, 3)
        e = _sample_embed(features, pts, cfg)  # (T_source, C)
        corr = jnp.einsum("sc,aghc->asgh", e, features)  # (T_anchor, T_src, ...)
        den = jnp.maximum(
            jnp.linalg.norm(e, axis=-1)[None, :, None, None]
            * fnorm[:, None], EPS
        )
        return _soft_argmax_batch(corr / den, grid, cfg)  # (T_a, T_s, 2)

    return jax.lax.map(per_query, trajectories)


def compute_occlusion(
    trajectories: np.ndarray,
    cos_sims: np.ndarray,
    anchors: np.ndarray,
    cfg: TrackerConfig,
) -> np.ndarray:
    """Occlusion flags (tracking_model.py:544-575), numpy host-side since the
    per-query visible-anchor sets are ragged."""
    N, T = trajectories.shape[:2]
    occ = np.zeros((N, T), bool)
    for n in range(N):
        vis = cos_sims[n] >= cfg.anchor_cos_threshold
        if vis.sum() == 0:
            occ[n] = cos_sims[n] < cfg.cos_threshold
            continue
        green = anchors[n][vis]  # (A, T, 2): anchor rows restricted to visible
        dists = np.linalg.norm(
            green - trajectories[n][vis][:, None, :], axis=-1
        )  # (A, T): dist of cycle prediction to source trajectory

        def med0(a):  # torch.median: LOWER middle, not the numpy average
            return np.sort(a, axis=0)[(a.shape[0] - 1) // 2]

        th = med0(dists[:, vis]).max()
        med = med0(dists)  # (T,)
        occ[n] = (med > th) | (cos_sims[n] < cfg.cos_threshold)
    return occ


def infer_tracks(
    features: np.ndarray, query_points: np.ndarray, cfg: TrackerConfig
) -> Tuple[np.ndarray, np.ndarray]:
    """Full inference (ModelInference.infer, tracking_model.py:578-594):
    features (T, gh, gw, C), query (N, 3) -> (trajs (N, T, 2), occ (N, T))."""
    f = jnp.asarray(features)
    q = jnp.asarray(query_points, jnp.float32)
    trajs = generate_trajectories(f, q, cfg)
    cos, _ = trajectory_cos_sims(f, trajs, q, cfg)
    anchors = anchor_trajectories(f, trajs, cfg)
    occ = compute_occlusion(
        np.asarray(trajs), np.asarray(cos), np.asarray(anchors), cfg
    )
    return np.asarray(trajs), occ
