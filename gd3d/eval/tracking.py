"""TAP-Vid DAVIS tracking evaluation driver.

Parity target: src/evaluate_timm.py:234-348 — 476x854 frames (cropped to
/16), per-frame dense features at stride = patch/2 with the pos-enc fix,
refine_conv, DINO-Tracker inference (cos thresholds 0.7/0.6, argmax radius
35), strided TAP-Vid metrics per video.
"""
from __future__ import annotations

import functools
import pickle
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np
import pandas as pd
from PIL import Image

from gd3d.eval.tracker import TrackerConfig, infer_tracks
from gd3d.eval.tracking_metrics import compute_tapvid_metrics_for_video
from gd3d.models.student import Student


@functools.lru_cache(maxsize=4)
def _feature_fn(student: Student, stride: int, refine: bool):
    """One jitted dense-feature program per (student, stride, refine) —
    jax.jit's dispatch cache is keyed on the callable, so rebuilding the
    lambda per video would re-trace/re-compile every video."""
    import jax

    return jax.jit(
        lambda p, x: student.dense_grid_features(
            p,
            x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x,
            stride=stride, refine=refine,
        )
    )


def video_features(
    student: Student,
    params: dict,
    frames: np.ndarray,
    refine: bool = True,
    batch_frames: int = 4,
) -> jnp.ndarray:
    """frames (T, H, W, 3) float [0,1] or uint8 -> (T, gh, gw, C)
    stride-(patch/2) features (evaluate_timm.py:259-281). One jitted
    program reused for all frames, `batch_frames` frames per dispatch
    (amortizes the ~40 ms tunnel dispatch; the tail batch pads by
    repetition). uint8 frames normalize ON device (4x fewer transfer
    bytes — lossless for the PIL-decoded loader path). The result stays
    DEVICE-resident: infer_tracks consumes it per query-frame set, and
    returning numpy here cost a T x 19 MB round-trip per set."""
    ps = student.cfg.patch_size
    fn = _feature_fn(student, ps // 2, refine)
    T = frames.shape[0]
    feats = []
    for lo in range(0, T, batch_frames):
        chunk = frames[lo: lo + batch_frames]
        if len(chunk) < batch_frames:  # pad by repetition, slice below
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], batch_frames - len(chunk), 0)])
        feats.append(fn(params, jnp.asarray(chunk)))
    return jnp.concatenate(feats)[:T]


def load_video_frames(video_dir: str, h: int, w: int) -> np.ndarray:
    imgs = []
    for fn in sorted(Path(video_dir).glob("*.jpg")):
        imgs.append(
            np.asarray(Image.open(fn).resize((w, h), Image.LANCZOS))
        )
    # uint8: video_features normalizes on device (4x fewer tunnel bytes)
    return np.stack(imgs)


def tracking_single(
    student: Student,
    params: dict,
    video_id: int,
    benchmark_config: Dict,
    video_root: str = "data/davis_480",
    refine: bool = True,
    size_hw=(476, 854),
) -> Dict[str, float]:
    ps = student.cfg.patch_size
    h = size_hw[0] // ps * ps
    w = size_hw[1] // ps * ps

    # resolve the benchmark entry BEFORE the expensive feature pass
    video_config = next(
        (vc for vc in benchmark_config["videos"]
         if vc["video_idx"] == video_id), None)
    if video_config is None:
        raise KeyError(
            f"video_idx {video_id} not in the benchmark pkl "
            f"({len(benchmark_config['videos'])} videos)")

    frames = load_video_frames(f"{video_root}/{video_id}/video", h, w)
    feats = video_features(student, params, frames, refine)
    rx = w / video_config["w"]
    ry = h / video_config["h"]

    cfg = TrackerConfig(
        patch_size=ps, stride=ps // 2, video_h=h, video_w=w
    )
    trajectories_dict, occlusions_dict = {}, {}
    for frame_idx in sorted(video_config["query_points"].keys()):
        qpts = np.array(
            [
                [rx * q[0], ry * q[1], frame_idx]
                for q in video_config["query_points"][frame_idx]
            ],
            np.float32,
        )
        trajs, occ = infer_tracks(feats, qpts, cfg)
        trajectories_dict[frame_idx] = trajs
        occlusions_dict[frame_idx] = occ

    metrics = compute_tapvid_metrics_for_video(
        trajectories_dict, occlusions_dict, benchmark_config, video_id,
        pred_video_sizes=[w, h],
    )
    metrics["video_idx"] = int(video_id)
    return metrics


def tracking(
    student: Student,
    params: dict,
    num_videos: int = 30,
    benchmark_pkl: str = "data/tapvid_davis_data_strided.pkl",
    video_root: str = "data/davis_480",
    refine: bool = True,
) -> pd.DataFrame:
    with open(benchmark_pkl, "rb") as f:
        benchmark_config = pickle.load(f)
    rows = [
        tracking_single(
            student, params, vid, benchmark_config, video_root, refine
        )
        for vid in range(num_videos)
    ]
    df = pd.DataFrame(rows)
    df.set_index(["video_idx"], inplace=True)
    return df
