"""MASt3R sparse global alignment (gd3d/sparse_ga.py).

Reference-direct building blocks (gamma losses, lr schedules, canonical
views, anchor offsets, MST) against the ACTUAL mast3r/cloud_opt code, plus
a synthetic two-stage recovery test: ground-truth multi-view observations
of a world plane -> the kinematic-chain optimizer must recover the
relative camera geometry and reduce reprojection error in the fine stage.
"""
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from gd3d.sparse_ga import (
    SparseScene,
    anchor_depth_offsets,
    build_scene,
    canonical_view,
    compute_min_spanning_tree,
    cosine_schedule,
    dense_pts3d,
    gamma_loss,
    linear_schedule,
    sparse_scene_optimizer,
)

REF = "/root/reference"


def _ref_sparse_ga():
    """Import the ACTUAL mast3r.cloud_opt.sparse_ga (roma, torchvision and
    the viz module are stubbed — not touched by the functions under
    test)."""
    from test_reference_loss_parity import _install_stubs

    _install_stubs()
    if "roma" not in sys.modules:
        sys.modules["roma"] = types.ModuleType("roma")
    if "dust3r.viz" not in sys.modules:
        viz = types.ModuleType("dust3r.viz")
        viz.SceneViz = object
        viz.segment_sky = lambda *a, **k: None
        viz.auto_cam_size = lambda *a, **k: 1.0
        viz.to_numpy = lambda x: np.asarray(x)
        sys.modules["dust3r.viz"] = viz
    from mast3r.cloud_opt import sparse_ga as SG
    return SG


# ------------------------------------------------- reference-direct bits
@pytest.mark.slow
def test_reference_gamma_loss_and_schedules():
    import torch

    if REF not in sys.path:
        sys.path.append(REF)
    from mast3r.cloud_opt.utils import losses as RL
    from mast3r.cloud_opt.utils import schedules as RS

    rng = np.random.RandomState(0)
    x = rng.randn(7, 3).astype(np.float32)
    y = rng.randn(7, 3).astype(np.float32)
    for g in (1.1, 0.4, 1.0):
        want = RL.gamma_loss(g)(torch.from_numpy(x),
                                torch.from_numpy(y)).numpy()
        got = np.asarray(gamma_loss(g)(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    for a in (0.0, 0.3, 1.0):
        np.testing.assert_allclose(
            cosine_schedule(a, 0.2), RS.cosine_schedule(a, 0.2), rtol=1e-7)
        np.testing.assert_allclose(
            linear_schedule(a, 0.2, 0.01),
            RS.linear_schedule(a, 0.2, 0.01), rtol=1e-7)


@pytest.mark.slow
def test_reference_canonical_view_and_anchors():
    import torch

    SG = _ref_sparse_ga()
    rng = np.random.RandomState(1)
    n, H, W, sub = 3, 32, 48, 8
    pt = (rng.rand(n, H, W, 3) + [0.1, 0.1, 1.5]).astype(np.float32)
    cf = (1.0 + rng.rand(n, H, W)).astype(np.float32)

    for mode in ("avg-angle", "avg-reldepth"):
        w_canon, w_canon2, w_conf = SG.canonical_view(
            torch.from_numpy(pt), torch.from_numpy(cf), sub, mode=mode)
        g_canon, g_canon2, g_conf = canonical_view(
            jnp.asarray(pt), jnp.asarray(cf), sub, mode=mode)
        np.testing.assert_allclose(np.asarray(g_canon), w_canon.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_canon2), w_canon2.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(g_conf), w_conf.numpy(),
                                   rtol=1e-4, atol=1e-5)

    # anchor offsets on the canonical relative-depth map
    canon2 = np.asarray(g_canon2)
    pix = np.stack([rng.randint(0, W, 25), rng.randint(0, H, 25)], -1)
    w_idx, w_off = SG.anchor_depth_offsets(
        torch.from_numpy(canon2), {0: (torch.from_numpy(pix).float(), None)},
        subsample=sub)
    g_idx, g_off = anchor_depth_offsets(canon2, pix, sub)
    np.testing.assert_array_equal(g_idx, w_idx[0].numpy())
    np.testing.assert_allclose(g_off, w_off[0].numpy(), rtol=1e-6)


@pytest.mark.slow
def test_reference_min_spanning_tree():
    """200 random instances: the double-BFS midpoint uses VISITATION-order
    ranks (sparse_ga.py:984-988), not hop depth — a depth-rank
    transcription diverged on ~40% of branching trees and a single-seed
    test missed it."""
    import torch

    SG = _ref_sparse_ga()
    rng = np.random.RandomState(3)
    for case in range(200):
        n = int(rng.randint(3, 9))
        scores = rng.rand(n, n).astype(np.float32)
        scores = (scores + scores.T) / 2
        np.fill_diagonal(scores, 0.0)
        if case % 3 == 0:  # sparsify: non-complete pair graphs too
            mask = rng.rand(n, n) < 0.4
            mask = mask | mask.T
            np.fill_diagonal(mask, False)
            scores = scores * (~mask)
            from scipy import sparse as sp
            ncomp = sp.csgraph.connected_components(
                sp.csr_array(scores != 0), directed=False)[0]
            if ncomp > 1:
                continue
        w_root, w_edges = SG.compute_min_spanning_tree(
            torch.from_numpy(scores))
        g_root, g_edges = compute_min_spanning_tree(scores)
        assert g_root == w_root, (case, g_root, w_root)
        assert [tuple(int(v) for v in e) for e in g_edges] == \
            [tuple(int(v) for v in e) for e in w_edges], case


# ------------------------------------------------------ synthetic scenes
def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)


def _make_synthetic(n=3, H=48, W=48, f=30.0, conf=10.0,
                    n_corres=48, seed=0):
    """GT cameras viewing a world SPHERE (center (0,0,8), r=7.3; wide FOV).
    A sphere, unlike a plane, has no homography ambiguity: once stage 2
    unfreezes the focals, a planar scene admits a continuum of (R, t, f)
    explanations with identical reprojection error (the dolly-zoom valley),
    so pose recovery would be ill-posed for ANY optimizer (the reference's
    included). Correspondence pixels in image j are kept at subpixel
    precision so the optimum sits at the GT geometry. Returns
    (build_scene kwargs, gt cam2w)."""
    rng = np.random.RandomState(seed)
    cx, cy = W / 2, H / 2
    sph_c, sph_r = np.float32([0.0, 0.0, 8.0]), 7.3
    cam2w = []
    for k in range(n):
        R = _rot_y(0.05 * (k - 1))
        t = np.float32([0.3 * (k - 1), 0.05 * k, -0.1 * k])
        M = np.eye(4, dtype=np.float32)
        M[:3, :3] = R
        M[:3, 3] = t
        cam2w.append(M)
    cam2w = np.stack(cam2w)

    us, vs = np.meshgrid(np.arange(W), np.arange(H))
    d_cam = np.stack([(us - cx) / f, (vs - cy) / f, np.ones_like(us)],
                     -1).astype(np.float32)

    def pointmap(k):
        R, t = cam2w[k, :3, :3], cam2w[k, :3, 3]
        dir_w = d_cam @ R.T
        # near ray-sphere intersection: |t + s*dir - c|^2 = r^2
        a = (dir_w ** 2).sum(-1)
        oc = t - sph_c
        b = 2.0 * (dir_w @ oc)
        c0 = (oc ** 2).sum() - sph_r ** 2
        disc = b * b - 4 * a * c0
        assert (disc > 0).all()
        s = (-b - np.sqrt(disc)) / (2 * a)
        assert (s > 0.05).all()
        return d_cam * s[..., None], t + dir_w * s[..., None]  # cam, world

    ptmaps, confs = [], []
    cams, worlds = [], []
    for k in range(n):
        pc, pw = pointmap(k)
        cams.append(pc)
        worlds.append(pw)
        noise = rng.randn(2, H, W, 3).astype(np.float32) * 1e-3
        ptmaps.append([pc + noise[0], pc + noise[1]])
        confs.append([np.full((H, W), 2.0, np.float32)] * 2)

    def project(k, pw):
        R, t = cam2w[k, :3, :3], cam2w[k, :3, 3]
        pc = (pw - t) @ R
        uv = pc[..., :2] / pc[..., 2:] * f + [cx, cy]
        return uv, pc[..., 2]

    corres = {}
    pts_in_other = {}
    confs_other = {}
    for i in range(n):
        for j in range(i + 1, n):
            m = 4  # border margin
            xi = rng.randint(m, W - m, n_corres * 4)
            yi = rng.randint(m, H - m, n_corres * 4)
            pw = worlds[i][yi, xi]
            uv_j, z_j = project(j, pw)
            ok = ((uv_j[:, 0] >= m) & (uv_j[:, 0] < W - m)
                  & (uv_j[:, 1] >= m) & (uv_j[:, 1] < H - m) & (z_j > 0))
            sel = np.where(ok)[0][:n_corres]
            assert len(sel) == n_corres, (i, j, len(sel))
            corres[(i, j)] = (
                np.stack([xi[sel], yi[sel]], -1).astype(np.float32),
                uv_j[sel].astype(np.float32),
                np.full(len(sel), conf, np.float32))
            # j's full pointmap in i's frame
            Ri, ti = cam2w[i, :3, :3], cam2w[i, :3, 3]
            pts_in_other[(i, j)] = ((worlds[j] - ti) @ Ri).astype(np.float32)
            confs_other[(i, j)] = np.full((H, W), 2.0, np.float32)
    return dict(hw=(H, W), ptmaps=ptmaps, confs=confs,
                pts_in_other=pts_in_other, confs_other=confs_other,
                corres=corres), cam2w


def _rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def _mean_reproj_err(scene: SparseScene, res):
    """Mean pixel error of reprojecting each side's 3D points into the
    OTHER image with the optimized cameras."""
    K = res["intrinsics"]
    w2c = np.linalg.inv(res["cam2w"])
    errs = []
    for e in range(len(scene.e_i)):
        i, j = int(scene.e_i[e]), int(scene.e_j[e])
        v = scene.valid[e]

        def reproj(k, pts):
            pc = pts @ w2c[k, :3, :3].T + w2c[k, :3, 3]
            return (pc[:, :2] / np.clip(pc[:, 2:], 1e-8, None)
                    * [K[k, 0, 0], K[k, 1, 1]] + K[k, :2, 2])

        errs.append(np.linalg.norm(
            reproj(i, res["pts3d_j"][e][v]) - scene.pix_i[e][v], axis=-1))
        errs.append(np.linalg.norm(
            reproj(j, res["pts3d_i"][e][v]) - scene.pix_j[e][v], axis=-1))
    return float(np.concatenate(errs).mean())


def _gauge_align(est, gt):
    """The root camera's pose is itself trainable (sparse_ga.py:173-174:
    quats/trans of EVERY image are nn.Parameters), so the reconstruction
    floats by a global rigid transform. Pin the gauge by mapping estimated
    cam 0 onto GT cam 0 before comparing."""
    g = gt[0] @ np.linalg.inv(est[0])
    return np.einsum("ab,nbc->nac", g, est)


@pytest.mark.slow
def test_two_stage_recovers_synthetic_geometry():
    kwargs, gt_cam2w = _make_synthetic()
    scene = build_scene(subsample=8, **kwargs)
    assert scene.matching_ok.all()
    assert len(scene.mst_edges) == scene.n_imgs - 1

    res = sparse_scene_optimizer(scene, niter1=300, niter2=300)
    fine, coarse = res["fine"], res["coarse"]

    # The COARSE (3D matching) stage recovers the relative geometry
    # exactly: focals/depths are frozen there, so the problem is
    # well-posed. The FINE (2D reprojection) stage is only held to its
    # own objective — the z_camera reparameterization (sparse_ga.py
    # :245-263, built so that "optimization is always trying to crush the
    # scale down" stays harmless) gives every camera an exact
    # dolly-zoom escape direction (focal up + camera retreat + depth
    # re-fit) along which reprojection error is asymptotically flat, so
    # after hundreds of post-convergence Adam steps (step size ~lr
    # regardless of gradient, betas=(0.9, 0.9)) the poses wander a few
    # degrees while the loss is unchanged. The reference optimizer has
    # the identical parameterization and the identical behavior; pose
    # accuracy is the coarse stage's contract, reprojection the fine's.
    est_c = _gauge_align(coarse["cam2w"], gt_cam2w)
    est_f = _gauge_align(fine["cam2w"], gt_cam2w)
    for a in range(scene.n_imgs):
        for b in range(a + 1, scene.n_imgs):
            gt_rel = gt_cam2w[a, :3, :3].T @ gt_cam2w[b, :3, :3]
            rel_c = est_c[a, :3, :3].T @ est_c[b, :3, :3]
            rel_f = est_f[a, :3, :3].T @ est_f[b, :3, :3]
            assert _rot_err_deg(gt_rel, rel_c) < 0.3, (a, b)
            assert _rot_err_deg(gt_rel, rel_f) < 6.0, (a, b)

    # coarse translation directions (gauge-aligned; scale is free)
    gt_base = gt_cam2w[1:, :3, 3] - gt_cam2w[0, :3, 3]
    est_base = est_c[1:, :3, 3] - est_c[0, :3, 3]
    for g, e in zip(gt_base, est_base):
        cos = g @ e / (np.linalg.norm(g) * np.linalg.norm(e) + 1e-12)
        assert cos > 0.99

    # both stages sit at sub-pixel reprojection error
    err_fine = _mean_reproj_err(scene, fine)
    err_coarse = _mean_reproj_err(scene, coarse)
    assert err_coarse < 0.5, err_coarse
    assert err_fine < 0.5, err_fine

    # densification produces full-res positive-depth maps
    pts, depths = dense_pts3d(scene, fine)
    assert pts[0].shape == (48 * 48, 3)
    assert all((d > 0).all() for d in depths)


@pytest.mark.slow
def test_low_matching_pair_falls_back_to_dust3r_loss():
    kwargs, _ = _make_synthetic(conf=10.0)
    # crush one pair's matching confidence below the gate
    (i, j) = (0, 2)
    xy_i, xy_j, cf = kwargs["corres"][(i, j)]
    kwargs["corres"][(i, j)] = (xy_i, xy_j, np.full_like(cf, 0.5))
    scene = build_scene(subsample=8, matching_conf_thr=5.0, **kwargs)
    ok = dict(zip(zip(scene.e_i.tolist(), scene.e_j.tolist()),
                  scene.matching_ok.tolist()))
    assert ok[(0, 2)] is False and ok[(0, 1)] is True
    res = sparse_scene_optimizer(scene, niter1=60, niter2=60)
    assert np.isfinite(res["fine"]["cam2w"]).all()
    assert np.isfinite(res["fine"]["depthmaps"]).all()


@pytest.mark.slow
def test_sparse_global_alignment_with_tiny_teacher():
    """API smoke: the frozen-teacher entry builds a scene and optimizes."""
    import jax

    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3r, Mast3rConfig  # noqa: F401
    from gd3d.sparse_ga import sparse_global_alignment
    from gd3d.teachers.mast3r import Mast3rTeacher

    tiny = Mast3rConfig(
        croco=CrocoConfig(
            patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=16, dec_depth=2, dec_num_heads=2),
        local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16)
    teacher = Mast3rTeacher(tiny)
    H = W = 64
    params = teacher.init_params(jax.random.key(0), hw=(H, W))
    imgs = jnp.asarray(
        np.random.RandomState(5).rand(3, H, W, 3) * 2 - 1, jnp.float32)
    scene, res = sparse_global_alignment(
        teacher, params, imgs, subsample=8, matching_conf_thr=0.0,
        niter1=5, niter2=5)
    assert scene.n_imgs == 3
    assert res["fine"]["cam2w"].shape == (3, 4, 4)
    assert np.isfinite(res["fine"]["cam2w"]).all()


@pytest.mark.slow
def test_sparse_ga_cli_smoke(tmp_path):
    """gd3d-align --sparse-ga end to end: synthetic views through the
    two-stage flow, densified scene.npz (+ ply) artifacts."""
    from gd3d.cli.align import main
    from gd3d.data.render_synthetic import render_object_tree

    render_object_tree(str(tmp_path), ["obj"], n_views=3, size=96)
    imgs = sorted((tmp_path / "obj").glob("color_*.png"))
    out = tmp_path / "scene"
    main(["--images", *map(str, imgs), "--output", str(out), "--tiny",
          "--size", "224", "--sparse-ga", "--ga-niter1", "5",
          "--ga-niter2", "5", "--ga-subsample", "16", "--ply",
          "--tsdf", "0.3"])  # --tsdf must be ignored with a warning
    z = np.load(out / "scene.npz")
    n = len(imgs)
    assert z["poses"].shape == (n, 4, 4)
    assert np.all(np.isfinite(z["poses"]))
    H, W = z["depthmaps"].shape[1:]
    assert z["pts3d"].shape == (n, H * W, 3)
    assert np.all(np.isfinite(z["pts3d"]))
    assert z["focals"].shape == (n,)
    assert (out / "pointcloud.ply").exists()
    header = (out / "pointcloud.ply").read_text().splitlines()[:2]
    assert header[0] == "ply"
