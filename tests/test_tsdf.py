"""TSDF depth refinement (gd3d/tsdf.py) on a smooth synthetic scene.

Mirror of MASt3R's TSDFPostProcess (mast3r/cloud_opt/tsdf_optimizer.py):
a corrupted depth map must be pulled back toward the multi-view-consistent
surface by the TSDF zero-crossing search. TSDF fusion assumes a coherent
surface, so the scene here is a world plane observed from several posed
cameras (the aligner tests' white-noise depths would make the multi-view
SDF meaningless).
"""
import numpy as np

from gd3d.align import Scene
from gd3d.tsdf import tsdf_refine
from tests.test_global_align import FOCAL, H, W, _rotmat


def _plane_scene(n=4, z_plane=3.0):
    """Cameras looking at the world plane z = z_plane."""
    poses = []
    for k in range(n):
        R = _rotmat([0.3, 1.0, 0.1], 0.08 * k)
        t = np.asarray([0.25 * k, 0.1 * k, -0.05 * k])
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = t
        poses.append(P)
    poses = np.stack(poses)

    ys, xs = np.mgrid[0:H, 0:W]
    ray = np.stack(
        [(xs - W / 2) / FOCAL, (ys - H / 2) / FOCAL, np.ones_like(xs)], -1
    )  # (H, W, 3) camera-frame directions at depth 1
    depths, pts_cam = [], []
    for k in range(n):
        d_w = ray @ poses[k][:3, :3].T  # world-frame directions
        lam = (z_plane - poses[k][2, 3]) / d_w[..., 2]  # world z hits plane
        depths.append(lam.astype(np.float64))  # camera depth = lam * 1
        pts_cam.append(ray * lam[..., None])
    depths = np.stack(depths)
    pts_cam = np.stack(pts_cam)

    edges, pred_i, pred_j, conf_i, conf_j = [], [], [], [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            rel = np.linalg.inv(poses[i]) @ poses[j]
            pj = pts_cam[j].reshape(-1, 3) @ rel[:3, :3].T + rel[:3, 3]
            edges.append((i, j))
            pred_i.append(pts_cam[i])
            pred_j.append(pj.reshape(H, W, 3))
            conf_i.append(np.full((H, W), 3.0))
            conf_j.append(np.full((H, W), 3.0))
    scene = Scene.from_pairs(edges, pred_i, pred_j, conf_i, conf_j)
    return scene, poses, depths


def _gt_out(poses, depths):
    n = len(poses)
    return {
        "poses": np.asarray(poses, np.float32),
        "focals": np.full((n,), FOCAL, np.float32),
        "principal_points": np.tile(
            np.asarray([[W / 2, H / 2]], np.float32), (n, 1)),
        "depthmaps": np.asarray(depths, np.float32),
    }


def test_tsdf_refine_pulls_corrupted_depths_back():
    scene, poses, depths = _plane_scene()
    out = _gt_out(poses, depths)
    rng = np.random.RandomState(0)
    noisy = np.asarray(out["depthmaps"]).copy()
    noisy[0] = noisy[0] + 0.15 * rng.randn(H, W).astype(np.float32)
    out["depthmaps"] = noisy

    ref = tsdf_refine(scene, out, thresh=0.4, nsamples=256, seed=1,
                      chunk=4096)
    got = np.asarray(ref["depthmaps"])
    err_before = np.abs(noisy[0] - depths[0]).mean()
    err_after = np.abs(got[0] - depths[0]).mean()
    # the multi-view zero-crossing search recovers a substantial part of
    # the noise (the corrupted view itself still votes 1-of-4, and the
    # nearest-pixel gather is coarse at 8x8)
    assert err_after < 0.6 * err_before, (err_before, err_after)
    assert ref["pts3d"].shape == (4, H, W, 3)


def test_tsdf_refine_keeps_consistent_depths():
    """With already-consistent smooth depths the refinement must stay near
    the surface (zero-crossing sits at the current depth)."""
    scene, poses, depths = _plane_scene()
    out = _gt_out(poses, depths)
    ref = tsdf_refine(scene, out, thresh=0.3, nsamples=128, seed=0,
                      chunk=4096)
    got = np.asarray(ref["depthmaps"])
    assert np.abs(got - depths).mean() < 0.05, np.abs(got - depths).mean()
