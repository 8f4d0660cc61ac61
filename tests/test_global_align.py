"""Global alignment (gd3d/align.py) on synthetic self-consistent scenes.

Construction: each image i gets a GT depth map, focal and cam2world pose;
pairwise "predictions" are fabricated exactly as dust3r defines them
(pred_i = img i's points in frame i, pred_j = img j's points in frame i),
so the GT configuration achieves zero loss and recovery is checkable up to
the global sim3 gauge.
"""
import numpy as np
import pytest

from gd3d.align import Scene, align_pair, global_align, init_from_tree

H = W = 8
FOCAL = 10.0


def _unproject(depth, focal):
    ys, xs = np.mgrid[0:H, 0:W]
    x = (xs - W / 2) / focal * depth
    y = (ys - H / 2) / focal * depth
    return np.stack([x, y, depth], -1)


def _rotmat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def _make_scene(n=4, seed=0):
    rng = np.random.RandomState(seed)
    depths = 2.0 + rng.rand(n, H, W)  # smooth-ish positive depths
    poses = []
    for k in range(n):
        R = _rotmat(rng.randn(3), 0.15 * k)
        t = np.asarray([0.4 * k, 0.1 * k, 0.05 * k])
        P = np.eye(4)
        P[:3, :3] = R
        P[:3, 3] = t
        poses.append(P)
    poses = np.stack(poses)

    pts_cam = np.stack([_unproject(depths[k], FOCAL) for k in range(n)])

    edges, pred_i, pred_j, conf_i, conf_j = [], [], [], [], []
    for i in range(n):
        for j in range(n):
            if i == j or abs(i - j) > 2:
                continue
            rel = np.linalg.inv(poses[i]) @ poses[j]  # frame j -> frame i
            pj_in_i = pts_cam[j].reshape(-1, 3) @ rel[:3, :3].T + rel[:3, 3]
            edges.append((i, j))
            pred_i.append(pts_cam[i])
            pred_j.append(pj_in_i.reshape(H, W, 3))
            conf_i.append(np.full((H, W), 3.0))
            conf_j.append(np.full((H, W), 3.0))
    scene = Scene.from_pairs(edges, pred_i, pred_j, conf_i, conf_j)
    return scene, poses, depths


def _rel_pose_errors(got_poses, gt_poses):
    """Max rotation error (deg) and translation-direction error (deg) over
    consecutive relative poses — invariant to the global sim3 gauge."""
    rot_err, dir_err, scales = [], [], []
    for k in range(len(gt_poses) - 1):
        rel_got = np.linalg.inv(np.asarray(got_poses[k])) @ np.asarray(
            got_poses[k + 1])
        rel_gt = np.linalg.inv(gt_poses[k]) @ gt_poses[k + 1]
        Rg = rel_got[:3, :3]
        Rg = Rg / np.cbrt(max(np.linalg.det(Rg), 1e-12))
        dR = Rg @ rel_gt[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        rot_err.append(ang)
        tg, tt = rel_got[:3, 3], rel_gt[:3, 3]
        cos = tg @ tt / max(np.linalg.norm(tg) * np.linalg.norm(tt), 1e-12)
        dir_err.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
        scales.append(np.linalg.norm(tg) / max(np.linalg.norm(tt), 1e-12))
    return max(rot_err), max(dir_err), scales


def test_tree_init_recovers_relative_poses():
    scene, gt_poses, _ = _make_scene()
    init = init_from_tree(scene)
    rot, direc, scales = _rel_pose_errors(init["poses"], gt_poses)
    assert rot < 0.5, rot
    assert direc < 0.5, direc
    # one consistent global scale
    assert np.ptp(scales) / np.mean(scales) < 0.02, scales
    np.testing.assert_allclose(init["focals"], FOCAL, rtol=0.05)


def test_global_align_converges_and_keeps_gt():
    scene, gt_poses, gt_depths = _make_scene()
    out = global_align(scene, niter=150)
    losses = np.asarray(out["losses"])
    # the Procrustes init is already near-exact on noiseless predictions;
    # the optimizer must STAY at a tiny loss through the lr schedule
    assert losses[-1] < 0.02, losses[-1]
    rot, direc, scales = _rel_pose_errors(np.asarray(out["poses"]), gt_poses)
    assert rot < 2.0, rot
    assert direc < 2.0, direc
    np.testing.assert_allclose(np.asarray(out["focals"]), FOCAL, rtol=0.1)
    # depth recovered up to the single global scale
    ratio = np.asarray(out["depthmaps"]) / gt_depths
    assert ratio.std() / ratio.mean() < 0.05


def test_global_align_known_poses_stay_fixed():
    scene, gt_poses, _ = _make_scene()
    out = global_align(scene, niter=50, known_poses=gt_poses)
    got = np.asarray(out["poses"])
    for k in range(len(gt_poses)):
        np.testing.assert_allclose(got[k], gt_poses[k], atol=2e-3)


def test_align_pair_fast_path():
    scene, gt_poses, _ = _make_scene(n=2)
    out = align_pair(scene)
    rot, direc, _ = _rel_pose_errors(out["poses"], gt_poses)
    assert rot < 0.5 and direc < 0.5
    np.testing.assert_allclose(out["focals"], FOCAL, rtol=0.05)


def test_scene_rejects_mixed_shapes():
    a = np.zeros((H, W, 3))
    b = np.zeros((H + 2, W, 3))
    c = np.zeros((H, W))
    with pytest.raises(AssertionError):
        Scene.from_pairs([(0, 1)], [a], [b], [c], [c])


def test_global_align_improves_noisy_scene():
    """With noisy pairwise predictions the Procrustes init is imperfect and
    the optimizer must reduce the consistency loss below its starting value
    (the actual optimization path, not just the init)."""
    scene, gt_poses, _ = _make_scene()
    rng = np.random.RandomState(7)
    noisy = Scene(
        edges=scene.edges,
        pred_i=scene.pred_i + 0.03 * rng.randn(*scene.pred_i.shape),
        pred_j=scene.pred_j + 0.03 * rng.randn(*scene.pred_j.shape),
        conf_i=scene.conf_i, conf_j=scene.conf_j,
        hw=scene.hw, n_imgs=scene.n_imgs,
    )
    out = global_align(noisy, niter=200)
    losses = np.asarray(out["losses"])
    # the injected noise sets an irreducible floor (the pairwise clouds are
    # mutually inconsistent by construction); ~20% is real optimization
    assert losses[-1] < 0.85 * losses[0], (losses[0], losses[-1])
    rot, direc, _ = _rel_pose_errors(np.asarray(out["poses"]), gt_poses)
    assert rot < 5.0, rot


@pytest.mark.slow
def test_scene_from_mast3r_teacher_end_to_end():
    """The aligner is reachable from the teacher stack: one batched
    extract_features over the complete pair graph -> Scene -> a few
    optimizer iterations, all finite."""
    from gd3d.align import scene_from_mast3r
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.teachers.mast3r import Mast3rTeacher
    import jax
    import jax.numpy as jnp

    teacher = Mast3rTeacher(Mast3rConfig(
        croco=CrocoConfig(
            patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=16, dec_depth=2, dec_num_heads=2),
        local_feat_dim=6, dpt_feature_dim=16, dpt_last_dim=8))
    params = teacher.init_params(jax.random.key(0), hw=(32, 64))
    images = jnp.asarray(
        np.random.RandomState(0).rand(3, 32, 64, 3) * 2 - 1, jnp.float32)

    scene = scene_from_mast3r(teacher, params, images)
    assert scene.n_imgs == 3 and len(scene.edges) == 6
    out = global_align(scene, niter=10)
    assert np.all(np.isfinite(np.asarray(out["losses"])))
    assert np.all(np.isfinite(np.asarray(out["poses"])))
    assert out["pts3d"].shape == (3, 32, 64, 3)


@pytest.mark.slow
def test_align_cli_smoke(tmp_path):
    """gd3d-align end to end: render synthetic views, align with a tiny
    random teacher, check the scene.npz + .ply artifacts."""
    from gd3d.cli.align import main
    from gd3d.data.render_synthetic import render_object_tree

    render_object_tree(str(tmp_path), ["obj"], n_views=3, size=96)
    imgs = sorted((tmp_path / "obj").glob("color_*.png"))
    out = tmp_path / "scene"
    main(["--images", *map(str, imgs), "--output", str(out), "--tiny",
          "--size", "224", "--niter", "5", "--pairs", "sliding", "--ply",
          "--min-conf", "0.0", "--tsdf", "0.3", "--tsdf-samples", "8"])
    z = np.load(out / "scene.npz")
    n = len(imgs)
    assert z["poses"].shape == (n, 4, 4)
    assert np.all(np.isfinite(z["poses"]))
    assert np.all(np.isfinite(z["losses"]))
    assert z["pts3d"].shape[0] == n
    assert (out / "pointcloud.ply").exists()
    header = (out / "pointcloud.ply").read_text().splitlines()[:3]
    assert header[0] == "ply"

    # sparse-anchor variant: same flow, top-K pixels only; swin graph +
    # seq prefilter exercise the scene-graph strategies through the CLI
    out_s = tmp_path / "scene_sparse"
    main(["--images", *map(str, imgs), "--output", str(out_s), "--tiny",
          "--size", "224", "--niter", "5", "--pairs", "swin-2",
          "--pair-filter", "seq1", "--ply",
          "--min-conf", "0.0", "--sparse", "64"])
    zs = np.load(out_s / "scene.npz")
    assert zs["depthmaps"].shape == (n, 64)
    assert zs["pts3d"].shape == (n, 64, 3)
    assert (out_s / "pointcloud.ply").exists()


def test_sparse_alignment_recovers_poses():
    """sparse_from_scene keeps top-k anchors per image; alignment on the
    sparse view recovers the same relative poses as the dense run."""
    from gd3d.align import sparse_from_scene

    scene, gt_poses, _ = _make_scene()
    sparse = sparse_from_scene(scene, k=24)
    assert sparse.pix.shape == (scene.n_imgs, 24, 2)
    assert sparse.pred_i.shape[1] == 24

    out = global_align(sparse, niter=150)
    assert np.all(np.isfinite(np.asarray(out["losses"])))
    rot, direc, _ = _rel_pose_errors(np.asarray(out["poses"]), gt_poses)
    assert rot < 2.0, rot
    assert direc < 2.0, direc
    np.testing.assert_allclose(np.asarray(out["focals"]), FOCAL, rtol=0.1)
    # sparse outputs keep the anchor axis
    assert out["depthmaps"].shape == (scene.n_imgs, 24)
    assert out["pts3d"].shape == (scene.n_imgs, 24, 3)


def test_sparse_anchor_gather_consistency():
    """Anchors index the owning image's maps: gathered pred_i at image i's
    anchors equals the dense map at those pixels."""
    from gd3d.align import sparse_from_scene

    scene, _, _ = _make_scene()
    sparse = sparse_from_scene(scene, k=16)
    e = 0
    i = int(scene.edges[e, 0])
    pix = sparse.pix[i]
    lin = (pix[:, 1] * W + pix[:, 0]).astype(int)
    np.testing.assert_allclose(
        np.asarray(sparse.pred_i[e]),
        np.asarray(scene.pred_i[e])[lin], rtol=1e-6)


def test_global_align_random_init_runs():
    """init=None skips the Procrustes tree init (random params) — the
    optimizer must still run finite from scratch."""
    scene, _, _ = _make_scene(n=3)
    out = global_align(scene, niter=20, init=None)
    assert np.all(np.isfinite(np.asarray(out["losses"])))
    assert np.all(np.isfinite(np.asarray(out["poses"])))


def _noisy_scene(seed=7, scale=0.03):
    scene, gt_poses, _ = _make_scene()
    rng = np.random.RandomState(seed)
    return Scene(
        edges=scene.edges,
        pred_i=scene.pred_i + scale * rng.randn(*scene.pred_i.shape),
        pred_j=scene.pred_j + scale * rng.randn(*scene.pred_j.shape),
        conf_i=scene.conf_i, conf_j=scene.conf_j,
        hw=scene.hw, n_imgs=scene.n_imgs,
    ), gt_poses


def test_principal_points_frozen_by_default():
    """Reference parity: optimizer.py optimize_pp=False freezes im_pp —
    even on a noisy scene (nonzero pp gradients) the returned principal
    points must stay at the image centers."""
    noisy, _ = _noisy_scene()
    out = global_align(noisy, niter=50)
    pp = np.asarray(out["principal_points"])
    np.testing.assert_allclose(pp, np.tile([[W / 2, H / 2]], (4, 1)))


def test_principal_points_move_when_enabled():
    noisy, _ = _noisy_scene()
    out = global_align(noisy, niter=50, optimize_pp=True)
    pp = np.asarray(out["principal_points"])
    assert np.abs(pp - np.asarray([W / 2, H / 2])).max() > 1e-4


def test_pw_adaptors_flag_changes_trajectory():
    """allow_pw_adaptors=False (reference default base_opt.py
    allow_pw_adaptors=False) must stop the adaptors from influencing the
    optimization; enabling them on a noisy scene changes the result."""
    noisy, _ = _noisy_scene()
    out0 = global_align(noisy, niter=60)
    out1 = global_align(noisy, niter=60, allow_pw_adaptors=True)
    # both converge...
    assert np.asarray(out0["losses"])[-1] < np.asarray(out0["losses"])[0]
    assert np.asarray(out1["losses"])[-1] < np.asarray(out1["losses"])[0]
    # ...but along different trajectories once adaptors are live
    assert not np.allclose(
        np.asarray(out0["losses"]), np.asarray(out1["losses"]))


def test_partial_pose_preset_keeps_pinned_frees_rest():
    """ModularPointCloudOptimizer.preset_pose with a mask
    (modular_optimizer.py:38-48): pinned images stay exactly at their
    preset; unpinned images still optimize and land near GT."""
    noisy, gt_poses = _noisy_scene()
    mask = np.asarray([True, True, False, False])
    out = global_align(noisy, niter=150, known_poses=gt_poses,
                       pose_mask=mask)
    got = np.asarray(out["poses"])
    for k in range(2):
        np.testing.assert_allclose(got[k], gt_poses[k], atol=2e-3)
    # free images moved off their (tree-init) start and converged: relative
    # pose error to GT stays small in the GT-anchored gauge
    rot, direc, _ = _rel_pose_errors(got, gt_poses)
    assert rot < 6.0, rot


def test_preset_focal_partial_mask():
    scene, _, _ = _make_scene()
    out = global_align(scene, niter=80, known_focals=np.asarray([12.0]),
                       focal_mask=np.asarray([0]))
    focals = np.asarray(out["focals"])
    np.testing.assert_allclose(focals[0], 12.0, rtol=1e-6)  # pinned exact
    np.testing.assert_allclose(focals[1:], FOCAL, rtol=0.1)  # free ~ GT


def test_preset_principal_point_partial_mask():
    noisy, _ = _noisy_scene()
    pp0 = np.asarray([[W / 2 + 1.0, H / 2 - 1.0]])
    out = global_align(noisy, niter=50, known_pp=pp0,
                       pp_mask=np.asarray([0]), optimize_pp=True)
    pp = np.asarray(out["principal_points"])
    np.testing.assert_allclose(pp[0], pp0[0], rtol=1e-6)  # pinned exact
    # unpinned pps are live (optimize_pp=True) and move off center
    assert np.abs(pp[1:] - np.asarray([W / 2, H / 2])).max() > 1e-4


def test_preset_known_depths_stay_exact():
    scene, gt_poses, gt_depths = _make_scene()
    mask = np.asarray([True, False, False, False])
    out = global_align(scene, niter=80, known_poses=gt_poses,
                       known_depths=gt_depths, depth_mask=mask)
    got = np.asarray(out["depthmaps"])
    np.testing.assert_allclose(got[0], gt_depths[0], rtol=1e-6)
    # free depths stay near GT too (pinned pose+depth anchors the scale)
    ratio = got[1:] / gt_depths[1:]
    assert abs(ratio.mean() - 1) < 0.05 and ratio.std() < 0.05
