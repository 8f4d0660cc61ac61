"""ARKitScenes raw->tree preprocessor (gd3d/data/preprocess_arkitscenes.py).

Covers the numpy SQUAD spline (knot interpolation, 2-knot slerp
reduction, hemisphere unflipping), the sky-direction detector, and the
full raw-layout -> all_metadata.npz -> ARKitScenesViews roundtrip."""
import json
import os

import numpy as np
import pytest
from PIL import Image
from scipy.spatial.transform import Rotation

from gd3d.data.preprocess_arkitscenes import (
    find_scene_orientation,
    matrix_to_quat,
    quat_to_matrix,
    read_traj,
    squad,
    unflip_rotors,
)


def _rand_quats(n, seed):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return q


def test_squad_hits_knots_exactly():
    q = unflip_rotors(_rand_quats(5, 1))
    t = np.array([0.0, 1.0, 2.5, 3.0, 4.0])
    out = squad(q, t, t)
    # sign-insensitive quaternion equality
    for a, b in zip(out, q):
        assert min(np.linalg.norm(a - b), np.linalg.norm(a + b)) < 1e-9


def test_squad_two_knots_is_slerp():
    q = unflip_rotors(_rand_quats(2, 2))
    t = np.array([0.0, 1.0])
    te = np.linspace(0, 1, 7)
    out = squad(q, t, te)
    sl = Rotation.from_quat(q[:, [1, 2, 3, 0]])  # wxyz -> xyzw
    from scipy.spatial.transform import Slerp

    ref = Slerp(t, sl)(te).as_quat()[:, [3, 0, 1, 2]]
    for a, b in zip(out, ref):
        assert min(np.linalg.norm(a - b), np.linalg.norm(a + b)) < 1e-9


def test_squad_is_continuous_and_unit():
    q = unflip_rotors(_rand_quats(6, 3))
    t = np.arange(6.0)
    te = np.linspace(0, 5, 101)
    out = squad(q, t, te)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                               atol=1e-9)
    # small steps -> small rotation deltas (continuity across segments)
    for a, b in zip(out[:-1], out[1:]):
        assert abs(np.clip(np.dot(a, b), -1, 1)) > 0.99


def test_unflip_rotors():
    q = _rand_quats(4, 4)
    q[1] *= -1
    q[3] *= -1
    u = unflip_rotors(q)
    for a, b in zip(u[:-1], u[1:]):
        assert np.dot(a, b) >= 0


def test_quat_matrix_roundtrip():
    for q in _rand_quats(10, 5):
        R = quat_to_matrix(q)
        q2 = matrix_to_quat(R)
        assert min(np.linalg.norm(q2 - q), np.linalg.norm(q2 + q)) < 1e-9


# ------------------------------------------------------- sky direction
def _pose_from_cols(c1, c2):
    """cam2world with device right -> c1, device -y (up) -> c2."""
    c1, c2 = np.float64(c1), np.float64(c2)
    c3 = np.cross(c1, -c2)  # device +y column = -(device up image)
    R = np.stack([c1, -c2, c3], axis=1)
    pose = np.eye(4)
    pose[:3, :3] = R
    return pose


def test_find_scene_orientation_up_and_left():
    # device right horizontal, device up = world up -> UP
    sky, rot = find_scene_orientation(
        [_pose_from_cols((1, 0, 0), (0, 0, 1))] * 3)
    assert sky == "UP"
    np.testing.assert_allclose(rot, np.eye(4), atol=1e-12)
    # device right pointing DOWN (angle to world up = 180 > 90), device
    # up horizontal -> LEFT (arkitscenes :325-330)
    sky, rot = find_scene_orientation(
        [_pose_from_cols((0, 0, -1), (1, 0, 0))] * 3)
    assert sky == "LEFT"
    # rotated_to_cam undoes a +90deg z-rotation
    np.testing.assert_allclose(
        rot[:3, :3],
        Rotation.from_rotvec([0, 0, np.pi / 2]).as_matrix().T, atol=1e-12)
    # device up horizontal the other way -> RIGHT
    sky, _ = find_scene_orientation(
        [_pose_from_cols((0, 0, 1), (-1, 0, 0))] * 3)
    assert sky == "RIGHT"
    # device up pointing down -> DOWN
    sky, _ = find_scene_orientation(
        [_pose_from_cols((-1, 0, 0), (0, 0, -1))] * 3)
    assert sky == "DOWN"


# --------------------------------------------------------- raw -> tree
def _make_raw_scene(root, pairs_root, scene="41069021", n=4,
                    w=80, h=60):
    rng = np.random.default_rng(31)
    sdir = root / "Training" / scene
    os.makedirs(sdir / "vga_wide")
    os.makedirs(sdir / "lowres_depth")
    os.makedirs(sdir / "vga_wide_intrinsics")

    # UP-oriented cam2world poses with a slow drift; traj stores
    # world->device angle-axis (arkitscenes read_traj :60-90)
    lines = []
    basenames = []
    for i in range(n):
        ts = 0.001 * (i + 1)
        pose = _pose_from_cols((1, 0, 0), (0, 0, 1))
        pose[:3, 3] = [0.1 * i, 0.0, 0.0]
        w2p = np.linalg.inv(pose)
        rv = Rotation.from_matrix(w2p[:3, :3]).as_rotvec()
        t = w2p[:3, 3]
        lines.append(f"{ts:.6f} {rv[0]} {rv[1]} {rv[2]} "
                     f"{t[0]} {t[1]} {t[2]}")
        basename = f"{scene}_{ts:.3f}.png"
        basenames.append(basename)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(sdir / "vga_wide" / basename)
        # lowres depth at half resolution, mm
        depth = (rng.random((h // 2, w // 2)) * 900 + 600).astype(
            np.uint16)
        Image.fromarray(depth).save(sdir / "lowres_depth" / basename)
        with open(sdir / "vga_wide_intrinsics" /
                  f"{scene}_{ts:.3f}.pincam", "w") as f:
            f.write(f"{w} {h} 70.0 70.0 {w / 2} {h / 2}\n")
    with open(sdir / "lowres_wide.traj", "w") as f:
        f.write("\n".join(lines) + "\n")

    pdir = pairs_root / "Training"
    os.makedirs(pdir / scene)
    with open(pdir / "scene_list.json", "w") as f:
        json.dump([scene], f)
    np.savez(pdir / scene / "selected_pairs.npz",
             selection=np.array(basenames[:3]),
             pairs=np.array([[0, 1, 0.9], [1, 2, 0.8]]),
             sky_direction_scene=np.array(["UP"]))
    return basenames


def test_arkitscenes_raw_to_tree_roundtrip(tmp_path):
    from gd3d.cli.preprocess import main
    from gd3d.data.stereo_views import ARKitScenesViews

    raw, pairs, out = (tmp_path / "raw", tmp_path / "pairs",
                       tmp_path / "out")
    basenames = _make_raw_scene(raw, pairs)
    main(["--dataset", "arkitscenes", "--raw-dir", str(raw),
          "--pairs-dir", str(pairs), "--output-dir", str(out)])

    with np.load(out / "Training" / "all_metadata.npz") as meta:
        assert list(meta["scenes"]) == ["41069021"]
        assert meta["images"].shape == (3,)
        assert meta["intrinsics"].shape == (3, 3, 3)
        np.testing.assert_allclose(meta["intrinsics"][0, 0, 0], 70.0)
        assert meta["trajectories"].shape == (3, 4, 4)
        # UP scene: rotated_to_cam is identity -> pose recovered from
        # the traj (timestamps coincide with knots, squad is exact there)
        np.testing.assert_allclose(
            meta["trajectories"][1][:3, 3], [0.1, 0, 0], atol=1e-9)
        assert meta["pairs"].shape == (2, 3)

    # converted images: jpg at full res; depth nearest-resized to match
    sd = out / "Training" / "41069021"
    img = Image.open(sd / "vga_wide" /
                     basenames[0].replace(".png", ".jpg"))
    assert img.size == (80, 60)
    depth = Image.open(sd / "lowres_depth" / basenames[0])
    assert depth.size == (80, 60)

    # the emitted tree is exactly what the loader consumes
    ds = ARKitScenesViews(str(out), split="train", resolution=(48, 32),
                          seed=12)
    assert len(ds) == 2
    v1, v2 = ds[0]
    assert v1["img"].shape == (32, 48, 3) and v1["valid_mask"].any()
    d = v1["depthmap"][v1["valid_mask"]]
    assert 0.5 < d.min() and d.max() < 1.6


def test_arkitscenes_sky_mismatch_asserts(tmp_path):
    from gd3d.data.preprocess_arkitscenes import process_scene

    raw, pairs = tmp_path / "raw", tmp_path / "pairs"
    _make_raw_scene(raw, pairs)
    bad = np.load(pairs / "Training" / "41069021" / "selected_pairs.npz")
    np.savez(pairs / "Training" / "41069021" / "selected_pairs.npz",
             selection=bad["selection"], pairs=bad["pairs"],
             sky_direction_scene=np.array(["LEFT"]))
    os.makedirs(tmp_path / "out" / "Training", exist_ok=True)
    with pytest.raises(AssertionError):
        process_scene("41069021", str(raw), str(pairs),
                      str(tmp_path / "out" / "Training"), "Training")


def test_arkitscenes_empty_selection_skipped(tmp_path):
    from gd3d.data.preprocess_arkitscenes import process_scene

    raw, pairs = tmp_path / "raw", tmp_path / "pairs"
    _make_raw_scene(raw, pairs)
    np.savez(pairs / "Training" / "41069021" / "selected_pairs.npz",
             selection=np.array([], dtype=str),
             pairs=np.zeros((0, 3)),
             sky_direction_scene=np.array(["UP"]))
    os.makedirs(tmp_path / "out" / "Training", exist_ok=True)
    assert not process_scene("41069021", str(raw), str(pairs),
                             str(tmp_path / "out" / "Training"),
                             "Training")
