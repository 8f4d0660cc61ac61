"""Visual localization against a globally-aligned scene.

Parity target: the dust3r visloc flow (/root/reference/dust3r/visloc.py:73-
140 + dust3r_visloc/localization.py) — for a query image, run the pairwise
teacher against each map view, match, lift the matched map pixels to the
scene's known 3D points, and PnP-RANSAC the query pose in scene frame.

Adaptations (documented):
  - matching uses MASt3R descriptors through the same on-device
    reciprocal-NN pipeline as the distillation step
    (gd3d/distill/keypoints.py) — the reference's dust3r variant matches
    nearest neighbors in predicted-point space because DUSt3R has no
    descriptor head (visloc.py:104 find_reciprocal_matches); with a MASt3R
    teacher the descriptor match is the native choice (it is what
    mast3r's own visloc pipeline matches on).
  - the query intrinsic defaults to the median-ratio focal estimated from
    the pairwise prediction (gd3d.align._estimate_focal — the same
    estimate_focal_knowing_depth core dust3r uses) with a centered
    principal point; callers with calibrated queries can pass K.
  - PnP is cv2 EPNP RANSAC via gd3d.eval.onepose.solve_pose
    (the reference's pnp_mode='cv2' path, localization.py run_pnp).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gd3d.align import _estimate_focal
from gd3d.crops import select_crop_pairs
from gd3d.distill.keypoints import filter_and_match_keypoints
from gd3d.eval.onepose import solve_pose


def match_query_to_map(
    teacher,
    params: dict,
    query: jnp.ndarray,
    map_imgs: jnp.ndarray,
    subsample: int = 8,
    border: int = 3,
    min_conf_percent: float = 10.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Match one query image against every map view in ONE batched teacher
    call. Returns (q_pix (M,N,2), m_pix (M,N,2), valid (M,N), query_pts3d
    (H,W,3)) with pixel (x, y) coords; N is the static match capacity."""
    M = map_imgs.shape[0]
    H, W = query.shape[0], query.shape[1]
    q = jnp.broadcast_to(query[None], (M,) + query.shape)
    feats = teacher.extract_features(params, q, map_imgs, 1.0)

    def one(desc1, desc2, conf1, conf2):
        return filter_and_match_keypoints(
            {"desc_1": desc1, "desc_2": desc2,
             "conf_1": conf1, "conf_2": conf2},
            H, W, subsample=subsample, border=border,
            min_conf_percent=min_conf_percent,
        )

    kp_q, kp_m, valid = jax.vmap(one)(
        feats["desc_1"], feats["desc_2"], feats["conf_1"], feats["conf_2"]
    )
    return (np.asarray(kp_q), np.asarray(kp_m), np.asarray(valid),
            np.asarray(feats["pts3d_1"][0]))


def fine_match_crops(
    teacher,
    params: dict,
    img_1: np.ndarray,
    img_2: np.ndarray,
    p1: np.ndarray,
    p2: np.ndarray,
    crop_hw: Tuple[int, int] = (384, 512),
    maxdim: int = 512,
    overlap: float = 0.5,
    max_pairs: int = 8,
    subsample: int = 8,
    border: int = 3,
    min_conf_percent: float = 10.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Coarse-to-fine second matching pass (mast3r coarse_to_fine analogue).

    Plans crop-window pairs covering the coarse matches p1 <-> p2 (full-res
    (x, y) pixels in img_1/img_2), then — TPU-first — runs ALL crop pairs as
    ONE batched teacher forward at the static `crop_hw` shape, matches per
    pair, and maps the matches back to full-image pixels. The crop batch is
    zero-padded to `max_pairs` so every call hits the same compiled program.

    Returns (kp_1 (K, N, 2), kp_2 (K, N, 2), valid (K, N)) in full-image
    pixel coordinates, K == max_pairs (padded rows all-invalid).
    """
    img_1 = np.asarray(img_1)
    img_2 = np.asarray(img_2)
    ch, cw = crop_hw
    cells1, cells2 = select_crop_pairs(
        img_1.shape, img_2.shape, p1, p2, maxdim=maxdim, overlap=overlap,
        forced_resolution=crop_hw, max_pairs=max_pairs)
    K = len(cells1)
    crops1 = np.zeros((max_pairs, ch, cw, img_1.shape[-1]), np.float32)
    crops2 = np.zeros((max_pairs, ch, cw, img_2.shape[-1]), np.float32)
    for i in range(K):
        l, t, r, b = cells1[i]
        crops1[i] = img_1[t:b, l:r]
        l, t, r, b = cells2[i]
        crops2[i] = img_2[t:b, l:r]

    feats = teacher.extract_features(
        params, jnp.asarray(crops1), jnp.asarray(crops2), 1.0)

    def one(desc1, desc2, conf1, conf2):
        return filter_and_match_keypoints(
            {"desc_1": desc1, "desc_2": desc2,
             "conf_1": conf1, "conf_2": conf2},
            ch, cw, subsample=subsample, border=border,
            min_conf_percent=min_conf_percent,
        )

    kp_1, kp_2, valid = jax.vmap(one)(
        feats["desc_1"], feats["desc_2"], feats["conf_1"], feats["conf_2"])
    kp_1 = np.asarray(kp_1, np.float32)
    kp_2 = np.asarray(kp_2, np.float32)
    valid = np.asarray(valid).copy()
    valid[K:] = False
    off1 = np.zeros((max_pairs, 2), np.float32)
    off2 = np.zeros((max_pairs, 2), np.float32)
    off1[:K] = cells1[:, 0:2]
    off2[:K] = cells2[:, 0:2]
    return kp_1 + off1[:, None], kp_2 + off2[:, None], valid


def solve_localization(
    q_pix: np.ndarray,
    m_pix: np.ndarray,
    valid: np.ndarray,
    map_indices: Sequence[int],
    scene_pts3d: np.ndarray,
    scene_conf: Optional[np.ndarray] = None,
    K: Optional[np.ndarray] = None,
    query_pts3d: Optional[np.ndarray] = None,
    hw: Optional[Tuple[int, int]] = None,
    min_conf: float = 1.5,
    reproj_px: float = 5.0,
) -> Dict[str, np.ndarray]:
    """2D(query)<->3D(scene) correspondences -> query cam2world pose.

    q_pix/m_pix/valid: (M, N, 2)/(M, N) stacked per-map-view matches
    (x, y); scene_pts3d (n_imgs, H, W, 3) world points of the aligned
    scene; scene_conf (n_imgs, H, W) gates map pixels (visloc.py:89
    confidence_threshold semantics). K: query intrinsic; estimated from
    query_pts3d (median-ratio focal) when absent.
    """
    n, H, W = scene_pts3d.shape[:3]
    pts2d, pts3d = [], []
    for row, mi in enumerate(map_indices):
        v = valid[row].astype(bool)
        if not v.any():
            continue
        qp = q_pix[row][v]
        mp = m_pix[row][v].astype(int)
        p3 = scene_pts3d[mi][mp[:, 1], mp[:, 0]]
        keep = np.ones(len(p3), bool)
        if scene_conf is not None:
            keep = scene_conf[mi][mp[:, 1], mp[:, 0]] > min_conf
        pts2d.append(qp[keep])
        pts3d.append(p3[keep])
    if not pts2d:
        return {"pose": np.eye(4), "n_matches": 0, "K": np.eye(3)}
    pts2d = np.concatenate(pts2d, 0)
    pts3d = np.concatenate(pts3d, 0)

    if K is None:
        assert query_pts3d is not None and hw is not None, (
            "pass K, or query_pts3d + hw to estimate the focal")
        f = _estimate_focal(query_pts3d, hw)
        K = np.asarray(
            [[f, 0, hw[1] / 2], [0, f, hw[0] / 2], [0, 0, 1]], np.float64)

    w2c = solve_pose(
        pts2d.astype(np.float64), pts3d.astype(np.float64),
        np.asarray(K, np.float64), reproj_px=reproj_px, pts3d_scale=1.0,
    )
    return {
        "pose": np.linalg.inv(w2c),  # cam2world in scene frame
        "n_matches": int(len(pts2d)),
        "K": np.asarray(K),
    }


def localize_image(
    teacher,
    params: dict,
    query: jnp.ndarray,
    scene_images: jnp.ndarray,
    scene_pts3d: np.ndarray,
    scene_conf: Optional[np.ndarray] = None,
    K: Optional[np.ndarray] = None,
    top_k: Optional[int] = None,
    coarse_to_fine: bool = False,
    query_hires: Optional[np.ndarray] = None,
    crop_hw: Optional[Tuple[int, int]] = None,
    fine_max_pairs: int = 8,
    **solve_kw,
) -> Dict[str, np.ndarray]:
    """End-to-end: query image (H, W, 3) in [-1, 1] vs an aligned scene
    (scene.npz fields images/pts3d/confidence). top_k limits the map views
    (all by default).

    coarse_to_fine: after the coarse pass, re-match the best map view
    through crop windows covering the coarse matches (mast3r
    coarse_to_fine flow) — pass `query_hires` (the query at native
    resolution, [-1, 1]) so the fine crops actually see more pixels; fine
    matches are mapped back to scene-grid coordinates before PnP.
    """
    n = scene_images.shape[0]
    idx = list(range(n if top_k is None else min(top_k, n)))
    q_pix, m_pix, valid, qpts = match_query_to_map(
        teacher, params, query, jnp.asarray(scene_images)[jnp.asarray(idx)])

    if coarse_to_fine:
        rows_q = [q_pix[r] for r in range(len(idx))]
        rows_m = [m_pix[r] for r in range(len(idx))]
        rows_v = [valid[r] for r in range(len(idx))]
        best = int(np.argmax(valid.sum(axis=1)))
        v = valid[best].astype(bool)
        if v.sum() >= 10:
            qh = np.asarray(query_hires if query_hires is not None else query)
            H, W = query.shape[0], query.shape[1]
            if crop_hw is None:
                # fine windows at the teacher's working (= scene) size: the
                # hires query is cropped, the map view rides along whole
                crop_hw = (H, W)
            sq = np.float32([qh.shape[1] / W, qh.shape[0] / H])
            map_img = np.asarray(scene_images[idx[best]])
            f_q, f_m, f_v = fine_match_crops(
                teacher, params, qh, map_img,
                q_pix[best][v] * sq, m_pix[best][v],
                crop_hw=crop_hw, maxdim=max(crop_hw),
                max_pairs=fine_max_pairs)
            for k in range(f_q.shape[0]):
                rows_q.append(f_q[k] / sq)   # back to scene-grid coords
                rows_m.append(f_m[k])
                rows_v.append(f_v[k])
                idx = idx + [idx[best]]
        q_pix, m_pix, valid = rows_q, rows_m, rows_v

    return solve_localization(
        q_pix, m_pix, valid, idx, scene_pts3d, scene_conf, K=K,
        query_pts3d=qpts, hw=tuple(query.shape[:2]), **solve_kw)
