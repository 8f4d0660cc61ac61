"""Visual localization (gd3d/visloc.py) — the dust3r visloc analogue.

solve_localization is validated with EXACT synthetic 2D-3D correspondences
(known query pose recovered through PnP); the end-to-end path (teacher
matching -> scene lift -> PnP) is smoke-tested through the CLI with a tiny
random teacher.
"""
import numpy as np
import pytest

from gd3d.visloc import solve_localization


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_solve_localization_recovers_known_pose():
    H = W = 32
    f = 40.0
    K = np.asarray([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float64)

    # scene: one map view whose pts3d live on a bumpy surface in world frame
    rng = np.random.RandomState(0)
    ys, xs = np.mgrid[0:H, 0:W]
    world = np.stack(
        [(xs - W / 2) / 8.0, (ys - H / 2) / 8.0,
         3.0 + 0.3 * np.sin(xs / 3.0) * np.cos(ys / 2.0)], -1)
    scene_pts3d = world[None]  # (1, H, W, 3)

    # GT query camera (world -> cam), in front of the surface
    R = _rotmat([0.2, 1.0, 0.1], 0.3)
    t = np.asarray([0.3, -0.2, 0.5])
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t

    # exact correspondences: project a subset of scene points into the query
    sel = rng.choice(H * W, 200, replace=False)
    p3 = world.reshape(-1, 3)[sel]
    cam = p3 @ R.T + t
    uv = (cam[:, :2] / cam[:, 2:]) * f + np.asarray([W / 2, H / 2])
    inside = ((uv[:, 0] >= 0) & (uv[:, 0] < W)
              & (uv[:, 1] >= 0) & (uv[:, 1] < H) & (cam[:, 2] > 0))
    assert inside.sum() > 50
    uv, p3, sel = uv[inside], p3[inside], sel[inside]

    # pack as (M=1, N, 2) match stacks: map pixels index scene_pts3d
    mp = np.stack([sel % W, sel // W], -1).astype(np.float32)
    q_pix = uv[None].astype(np.float32)
    m_pix = mp[None]
    valid = np.ones((1, len(uv)), bool)

    res = solve_localization(
        q_pix, m_pix, valid, [0], scene_pts3d, None, K=K, reproj_px=2.0)
    assert res["n_matches"] == len(uv)
    c2w_gt = np.linalg.inv(w2c)
    np.testing.assert_allclose(res["pose"], c2w_gt, atol=1e-3)


def test_solve_localization_focal_estimation_path():
    """Without K, the focal comes from the query's pairwise point map
    (median-ratio estimate) — exact for a noiseless pinhole cloud."""
    H = W = 16
    f = 25.0
    ys, xs = np.mgrid[0:H, 0:W]
    depth = 2.0 + 0.1 * np.sin(xs / 2.0)
    qpts = np.stack(
        [(xs - W / 2) / f * depth, (ys - H / 2) / f * depth, depth], -1)

    # identity query pose: scene points ARE the query cam points
    scene_pts3d = qpts[None]
    sel = np.arange(H * W)
    mp = np.stack([sel % W, sel // W], -1).astype(np.float32)
    uv = mp.copy()
    res = solve_localization(
        uv[None], mp[None], np.ones((1, H * W), bool), [0], scene_pts3d,
        None, K=None, query_pts3d=qpts, hw=(H, W), reproj_px=2.0)
    np.testing.assert_allclose(res["K"][0, 0], f, rtol=1e-3)
    np.testing.assert_allclose(res["pose"], np.eye(4), atol=1e-3)


def _tiny_teacher(hw):
    import jax

    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.teachers.mast3r import Mast3rTeacher

    tcfg = Mast3rConfig(
        croco=CrocoConfig(
            patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=16, dec_depth=2, dec_num_heads=2),
        local_feat_dim=6, dpt_feature_dim=16, dpt_last_dim=8)
    teacher = Mast3rTeacher(tcfg)
    params = teacher.init_params(jax.random.key(0), hw=hw)
    return teacher, params


@pytest.mark.slow
def test_fine_match_crops_batched_static_shape():
    """The coarse-to-fine pass: crops planned from coarse matches, one
    batched teacher forward, matches mapped back to full-image pixels and
    padded rows invalid (gd3d/visloc.py::fine_match_crops)."""
    from gd3d.crops import select_crop_pairs
    from gd3d.visloc import fine_match_crops

    rng = np.random.RandomState(0)
    H1, W1 = 192, 256
    H2, W2 = 160, 224
    img1 = rng.rand(H1, W1, 3).astype(np.float32) * 2 - 1
    img2 = rng.rand(H2, W2, 3).astype(np.float32) * 2 - 1
    n = 80
    p1 = np.c_[rng.rand(n) * (W1 - 1), rng.rand(n) * (H1 - 1)]
    p2 = np.c_[p1[:, 0] * (W2 / W1), p1[:, 1] * (H2 / H1)]

    crop_hw, max_pairs = (96, 128), 6
    teacher, params = _tiny_teacher(crop_hw)
    kp_1, kp_2, valid = fine_match_crops(
        teacher, params, img1, img2, p1, p2, crop_hw=crop_hw,
        maxdim=128, max_pairs=max_pairs, min_conf_percent=0.0)

    assert kp_1.shape[0] == max_pairs and kp_1.shape == kp_2.shape
    assert valid.shape == kp_1.shape[:2]

    cells1, cells2 = select_crop_pairs(
        (H1, W1), (H2, W2), p1, p2, maxdim=128,
        forced_resolution=crop_hw, max_pairs=max_pairs)
    K = len(cells1)
    assert K > 0
    assert not valid[K:].any()  # padded rows are all-invalid
    for i in range(K):
        v = valid[i]
        if not v.any():
            continue
        l, t, r, b = cells1[i]
        assert (kp_1[i][v][:, 0] >= l).all() and (kp_1[i][v][:, 0] < r).all()
        assert (kp_1[i][v][:, 1] >= t).all() and (kp_1[i][v][:, 1] < b).all()
        l, t, r, b = cells2[i]
        assert (kp_2[i][v][:, 0] >= l).all() and (kp_2[i][v][:, 0] < r).all()
        assert (kp_2[i][v][:, 1] >= t).all() and (kp_2[i][v][:, 1] < b).all()


@pytest.mark.slow
def test_localize_cli_coarse_to_fine_smoke(tmp_path):
    """the --coarse-to-fine flag end-to-end on a tiny aligned scene."""
    from gd3d.cli.align import main as align_main
    from gd3d.cli.localize import main as loc_main
    from gd3d.data.render_synthetic import render_object_tree

    render_object_tree(str(tmp_path), ["obj"], n_views=3, size=96)
    imgs = sorted((tmp_path / "obj").glob("color_*.png"))
    scene = tmp_path / "scene"
    align_main(["--images", *map(str, imgs), "--output", str(scene),
                "--tiny", "--size", "224", "--niter", "5",
                "--pairs", "sliding", "--sparse", "0"])
    out = tmp_path / "loc"
    loc_main(["--scene", str(scene / "scene.npz"),
              "--images", str(imgs[0]), "--output", str(out),
              "--tiny", "--size", "224", "--min-conf", "0.0",
              "--coarse-to-fine", "--fine-size", "448"])
    z = np.load(out / "query_poses.npz")
    assert z["poses"].shape == (1, 4, 4)
    assert np.all(np.isfinite(z["poses"]))


@pytest.mark.slow
def test_localize_cli_smoke(tmp_path):
    """align a tiny scene, then localize one of its own images."""
    from gd3d.cli.align import main as align_main
    from gd3d.cli.localize import main as loc_main
    from gd3d.data.render_synthetic import render_object_tree

    render_object_tree(str(tmp_path), ["obj"], n_views=3, size=96)
    imgs = sorted((tmp_path / "obj").glob("color_*.png"))
    scene = tmp_path / "scene"
    align_main(["--images", *map(str, imgs), "--output", str(scene),
                "--tiny", "--size", "224", "--niter", "5",
                "--pairs", "sliding", "--sparse", "0"])
    out = tmp_path / "loc"
    loc_main(["--scene", str(scene / "scene.npz"),
              "--images", str(imgs[0]), "--output", str(out),
              "--tiny", "--size", "224", "--min-conf", "0.0"])
    z = np.load(out / "query_poses.npz")
    assert z["poses"].shape == (1, 4, 4)
    assert np.all(np.isfinite(z["poses"]))
