"""OnePose-LowTexture object-pose evaluation.

Parity target: src/evaluate_timm.py:50-231 — template bank from seq-1
frames (LoFTR-annotated 2D keypoints <-> SfM 3D points, student descriptors
at /8-grid resolution with the x16 upsample), dense /4-stride query grid on
seq-2 frames, chunked mutual-NN matching, cv2.solvePnPRansac (EPNP, 8 px,
10k iters), accuracy at {1,3,5} degrees AND cm jointly.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import cv2
import jax.numpy as jnp
import numpy as np
import pandas as pd

from gd3d.models.student import Student
from gd3d.ops.geometry import query_pose_error
from gd3d.ops.interpolate import interpolate_features


_DESC_JIT_CACHE: dict = {}


def frame_descriptors(
    student: Student,
    params: dict,
    rgb: np.ndarray,
    kps: np.ndarray,
    refine: bool = True,
    device: bool = False,
) -> np.ndarray:
    """Descriptors at pixel keypoints of the ORIGINAL frame.

    Matches evaluate_timm.py:91-107: resize to (h//8*16, w//8*16), dense
    forward (ImageNet norm), refine_conv, interpolate at kp * 16/8,
    L2-normalize. The compute is one jitted program per (student, frame
    geometry, kp count)."""
    import jax

    h, w = rgb.shape[:2]
    ps = student.cfg.patch_size
    rh, rw = h // 8 * ps, w // 8 * ps
    img = cv2.resize(rgb.astype(np.float64) / 255.0, (rw, rh))

    key = (id(student), rh, rw, len(kps), refine)
    if key not in _DESC_JIT_CACHE:
        @jax.jit
        def fn(p, x, k):
            grid = student.dense_grid_features(p, x, refine=refine)
            d = interpolate_features(
                grid.transpose(0, 3, 1, 2), k / 8.0 * ps,
                h=rh, w=rw, normalize=False, patch_size=ps, stride=ps,
            )[0].T
            return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)

        _DESC_JIT_CACHE[key] = fn
    desc = _DESC_JIT_CACHE[key](
        params, jnp.asarray(img[None], jnp.float32),
        jnp.asarray(kps[None].astype(np.float32)),
    )
    # device=True keeps the (N, C) descriptors on-device for the matching
    # stage — pulling 50 MB per frame through a remote-device tunnel costs
    # ~1 s, ~4x the compute itself
    return desc if device else np.asarray(desc)


_NN_JIT_CACHE: dict = {}


def _device_argmax_rows(a, b, row_chunk: int = 2048) -> np.ndarray:
    """argmax_j a @ b.T per row, chunked over rows ON-DEVICE.

    The reference runs this matmul on the GPU (evaluate_timm.py:166-179);
    the numpy fallback below is its CPU transliteration, which at the
    real shapes (16k x 768 query grid vs a 120k bank = ~3 TFLOP) takes
    ~150 s/frame on a 1-core host. One jitted chunk loop on the TPU does
    the FLOPs in well under a second — pass jax arrays (descriptors
    already live on-device) or the host<->device transfer of the 350 MB
    bank dominates through a remote-device tunnel."""
    import jax

    n, d = a.shape
    pad = (-n) % row_chunk
    key = (n + pad, b.shape[0], d, row_chunk)
    if key not in _NN_JIT_CACHE:
        @jax.jit
        def run(ap, bp):
            def f(chunk):
                return jnp.argmax(chunk @ bp.T, axis=-1)

            return jax.lax.map(
                f, ap.reshape(-1, row_chunk, ap.shape[-1])).reshape(-1)

        _NN_JIT_CACHE[key] = run
    ap = jnp.pad(jnp.asarray(a, jnp.float32), ((0, pad), (0, 0)))
    out = np.asarray(_NN_JIT_CACHE[key](ap, jnp.asarray(b, jnp.float32)))
    return out[:n]


def mutual_nn_match_device(desc_q, desc_t) -> np.ndarray:
    """Mutual nearest neighbors with both argmax passes on-device.

    desc_q/desc_t may be numpy OR jax arrays; keeping them on-device
    (frame_descriptors(..., device=True)) avoids the transfer round trips.
    """
    nbr1 = _device_argmax_rows(desc_q, desc_t)
    nbr2 = _device_argmax_rows(desc_t, desc_q)
    mutual = nbr2[nbr1] == np.arange(len(nbr1))
    return np.where(mutual, nbr1, -1)


def mutual_nn_match(
    desc_q: np.ndarray, desc_t: np.ndarray, chunk_elems: int = 25000 * 10000
) -> np.ndarray:
    """Chunked mutual nearest neighbors (evaluate_timm.py:166-179).
    Returns (Nq,) template index or -1.

    Dispatches to the on-device path on TPU (identical result — argmax of
    the same similarity matrix); the numpy path is the fallback."""
    import jax

    if jax.default_backend() == "tpu":
        return mutual_nn_match_device(desc_q, desc_t)
    nbr1 = np.empty(len(desc_q), np.int64)
    step = max(1, (chunk_elems - 1) // max(len(desc_t), 1) + 1)
    for i in range(0, len(desc_q), step):
        sim = desc_q[i : i + step] @ desc_t.T
        nbr1[i : i + step] = sim.argmax(-1)
    nbr2 = np.empty(len(desc_t), np.int64)
    step = max(1, (chunk_elems - 1) // max(len(desc_q), 1) + 1)
    for i in range(0, len(desc_t), step):
        sim = desc_t[i : i + step] @ desc_q.T
        nbr2[i : i + step] = sim.argmax(-1)
    mutual = nbr2[nbr1] == np.arange(len(nbr1))
    out = np.where(mutual, nbr1, -1)
    return out


def solve_pose(
    kp2d: np.ndarray,
    pts3d: np.ndarray,
    K: np.ndarray,
    reproj_px: float = 8.0,
    iterations: int = 10000,
    pts3d_scale: float = 1000.0,
) -> np.ndarray:
    """EPNP RANSAC (evaluate_timm.py:187-201). Returns 4x4 pose (eye on fail)."""
    pose = np.eye(4)
    if len(kp2d) < 4:
        return pose
    ok, R_exp, trans, inliers = cv2.solvePnPRansac(
        pts3d * pts3d_scale,
        kp2d.reshape(-1, 1, 2),
        K,
        None,
        reprojectionError=reproj_px,
        iterationsCount=iterations,
        flags=cv2.SOLVEPNP_EPNP,
    )
    trans = trans / pts3d_scale
    if inliers is not None and len(inliers) > 5:
        R, _ = cv2.Rodrigues(R_exp)
        pose = np.concatenate(
            [np.concatenate([R, trans], axis=-1), [[0, 0, 0, 1]]], axis=0
        )
    return pose


def grid_keypoints(h: int, w: int, stride: int = 4) -> np.ndarray:
    xs = np.arange(0, w, stride)
    ys = np.arange(0, h, stride)
    xm, ym = np.meshgrid(xs, ys)
    return np.column_stack([xm.ravel(), ym.ravel()]).astype(float)


def evaluate_object(
    student: Student,
    params: dict,
    templates: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    test_frames: Sequence[Dict],
    grid_stride: int = 4,
    template_cap: int = 120_000,
    refine: bool = True,
    rng: Optional[np.random.RandomState] = None,
) -> Dict[str, float]:
    """Pose accuracy for one object.

    templates: list of (kp2d (N,2), rgb (H,W,3) uint8, kp3d (N,3)) seq-1
      frames; test_frames: dicts with rgb, intrinsic (3,3), pose_gt (4,4).
    """
    import jax

    on_tpu = jax.default_backend() == "tpu"
    rng = rng or np.random.RandomState(0)
    all_desc, all_pts3d = [], []
    for kp2d, rgb, kp3d in templates:
        d = frame_descriptors(student, params, rgb, kp2d, refine,
                              device=on_tpu)
        all_desc.append(d)
        all_pts3d.append(kp3d)
    xp = jnp if on_tpu else np
    desc_t = xp.concatenate(all_desc, 0)
    pts3d_t = np.concatenate(all_pts3d, 0)
    if len(desc_t) > template_cap:
        idx = rng.choice(len(desc_t), template_cap, replace=False)
        desc_t = desc_t[idx] if not on_tpu else jnp.take(
            desc_t, jnp.asarray(idx), axis=0)
        pts3d_t = pts3d_t[idx]

    R_errs, t_errs = [], []
    kp = None
    for frame in test_frames:
        rgb = frame["rgb"]
        if kp is None:
            kp = grid_keypoints(rgb.shape[0], rgb.shape[1], grid_stride)
        desc_q = frame_descriptors(student, params, rgb, kp, refine,
                                   device=on_tpu)
        nn = mutual_nn_match(desc_q, desc_t)  # routes on-device on TPU
        m = nn >= 0
        pose = solve_pose(kp[m], pts3d_t[nn[m]], frame["intrinsic"])
        r, t = query_pose_error(pose, frame["pose_gt"])
        R_errs.append(r)
        t_errs.append(t)

    R = np.array(R_errs)
    T = np.array(t_errs)
    return {
        f"threshold_{th}": float(np.mean((R < th) & (T < th)))
        for th in (1, 3, 5)
    }


def load_onepose_object(
    root: str, sfm_dir: str, obj_name: str, test_seq: str = "2",
    every_nth: int = 10,
):
    """Load templates + test frames from the OnePose-LowTexture layout
    (evaluate_timm.py:69-138)."""
    root = Path(root)
    seq1 = obj_name.split("-")[1] + "-1"
    seq2 = obj_name.split("-")[1] + f"-{test_seq}"
    anno3d = np.load(f"{sfm_dir}/{obj_name}/anno/anno_3d_average.npz")
    keypoints3d = anno3d["keypoints3d"]

    templates = []
    for json_fn in sorted((root / obj_name / seq1 / "anno_loftr").glob("*.json")):
        idx = json_fn.stem
        anno = json.load(open(json_fn))
        kp2d = np.array(anno["keypoints2d"])
        assign = np.array(anno["assign_matrix"])
        rgb = cv2.imread(str(root / obj_name / seq1 / "color" / f"{idx}.png"))[
            ..., ::-1
        ].copy()
        templates.append((kp2d[assign[0]], rgb, keypoints3d[assign[1]]))

    test_frames = []
    fns = sorted((root / obj_name / seq2 / "color").glob("*.png"))[::every_nth]
    for fn in fns:
        idx = fn.stem
        test_frames.append(
            {
                "rgb": cv2.imread(str(fn))[..., ::-1].copy(),
                "intrinsic": np.loadtxt(
                    str(root / obj_name / seq2 / "intrin_ba" / f"{idx}.txt")
                ),
                "pose_gt": np.loadtxt(
                    str(root / obj_name / seq2 / "poses_ba" / f"{idx}.txt")
                ),
            }
        )
    return templates, test_frames


def oneposepp(
    student: Student,
    params: dict,
    root: str = "data/lowtexture_test_data",
    sfm_dir: str = "data/sfm_output/outputs_softmax_loftr_loftr",
    num_objs: Optional[int] = None,
    refine: bool = True,
) -> pd.DataFrame:
    import os

    objs = sorted(
        n for n in os.listdir(root) if (Path(root) / n).is_dir()
    )
    if num_objs is not None:
        objs = objs[:num_objs]
    rows = []
    for obj in objs:
        templates, test_frames = load_onepose_object(root, sfm_dir, obj)
        rows.append(evaluate_object(student, params, templates, test_frames,
                                    refine=refine))
    df = pd.DataFrame(rows)
    df["objs"] = objs
    df.set_index(["objs"], inplace=True)
    return df
