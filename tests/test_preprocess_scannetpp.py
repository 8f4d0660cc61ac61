"""gd3d-preprocess --dataset scannetpp: fabricated RAW ScanNet++ scene
(COLMAP text reconstructions for DSLR fisheye + iPhone pinhole cameras, a
laser-scan PLY mesh, anonymization masks, precomputed pairs) ->
dust3r-preprocessed pretraining dump -> ScanNetppViews -> pretrain batch.

The scan mesh is a world plane at z=2 m and the cameras x-translate, so
geometric consistency is asserted end-to-end: the depth rendered from the
mesh with the POST-undistortion/rescale intrinsics must reproject
correspondences onto agreeing pixels — any slip in the colmap<->opencv
convention dance, the undistortion new-K, the pose inversion, or the
depth render would zero them out.
"""
import json

import numpy as np
import pytest
from PIL import Image

from gd3d.data.preprocess_scannetpp import (
    ZFAR,
    load_sfm,
    merge_scene_metadata,
    pose_from_qwxyz_txyz,
    process_scene,
    read_ply_mesh,
    render_depth,
    undistort_image,
)

SCENE = "0a1b2c3d4e"
H, W = 100, 120
FX = FY = 100.0


# --------------------------------------------------------------- fixtures
def _plane_mesh(z=2.0, half=4.0):
    verts = np.array([[-half, -half, z], [half, -half, z],
                      [half, half, z], [-half, half, z]], np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def _write_ply_binary(path, verts, faces):
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(b"comment fabricated scan\n")
        f.write(f"element vertex {len(verts)}\n".encode())
        # extra properties exercise the skip path
        f.write(b"property float x\nproperty float y\nproperty float z\n"
                b"property uchar red\nproperty uchar green\n"
                b"property uchar blue\n")
        f.write(f"element face {len(faces)}\n".encode())
        f.write(b"property list uchar int vertex_indices\nend_header\n")
        vdt = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                        ("r", "u1"), ("g", "u1"), ("b", "u1")])
        rec = np.zeros(len(verts), vdt)
        rec["x"], rec["y"], rec["z"] = verts.T.astype(np.float32)
        f.write(rec.tobytes())
        fdt = np.dtype([("n", "u1"), ("v", "<i4", (3,))])
        frec = np.zeros(len(faces), fdt)
        frec["n"] = 3
        frec["v"] = faces
        f.write(frec.tobytes())


def _write_colmap(sfm_dir, entries, cam_line):
    """entries: [(img_id, name, world2cam 4x4)]."""
    sfm_dir.mkdir(parents=True)
    with open(sfm_dir / "cameras.txt", "w") as f:
        f.write("# h1\n# h2\n# h3\n")
        f.write(cam_line + "\n")
    from scipy.spatial.transform import Rotation

    with open(sfm_dir / "images.txt", "w") as f:
        f.write("# header\n")
        for img_id, name, w2c in entries:
            q = Rotation.from_matrix(w2c[:3, :3]).as_quat()  # x y z w
            t = w2c[:3, 3]
            f.write(f"{img_id} {q[3]} {q[0]} {q[1]} {q[2]} "
                    f"{t[0]} {t[1]} {t[2]} 1 {name}\n")
            f.write("1.0 2.0 -1\n")  # sparse 2D points (unused)


def _make_raw_scene(root, pairsdir):
    rng = np.random.RandomState(0)
    data = root / "data" / SCENE
    dslr = data / "dslr"
    iphone = data / "iphone"
    scans = data / "scans"
    scans.mkdir(parents=True)
    _write_ply_binary(scans / "mesh_aligned_0.05.ply", *_plane_mesh())

    # DSLR: fisheye camera, zero distortion, two x-translating views
    dslr_entries = []
    for i, name in enumerate(("DSC00001.JPG", "DSC00002.JPG")):
        w2c = np.eye(4)
        w2c[0, 3] = -0.05 * i  # cam2world x = +0.05*i
        dslr_entries.append((i + 1, name, w2c))
    _write_colmap(dslr / "colmap", dslr_entries,
                  f"1 OPENCV_FISHEYE {W} {H} {FX} {FY} {W/2} {H/2} "
                  "0 0 0 0")
    (dslr / "resized_images").mkdir()
    (dslr / "resized_anon_masks").mkdir()
    for _, name, _ in dslr_entries:
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            dslr / "resized_images" / name)
        Image.fromarray(np.full((H, W), 255, np.uint8)).save(
            dslr / "resized_anon_masks" / (name[:-3] + "png"))

    # iPhone: plain OPENCV camera, zero distortion, one view
    ip_entries = [(1, "frame_000001.jpg", np.eye(4))]
    _write_colmap(iphone / "colmap", ip_entries,
                  f"1 OPENCV {W} {H} {FX} {FY} {W/2} {H/2} 0 0 0 0")
    (iphone / "rgb").mkdir()
    (iphone / "rgb_masks").mkdir()
    Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
        iphone / "rgb" / "frame_000001.jpg")
    Image.fromarray(np.full((H, W), 255, np.uint8)).save(
        iphone / "rgb_masks" / "frame_000001.png")

    scene_pairs = pairsdir / SCENE
    scene_pairs.mkdir(parents=True)
    selection = np.array(["DSC00001", "DSC00002", "frame_000001"])
    pairs = np.array([[0, 1, 0.9], [0, 2, 0.8]], np.float64)
    np.savez(scene_pairs / "selected_pairs.npz",
             selection=selection, pairs=pairs)
    with open(pairsdir / "scene_list.json", "w") as f:
        json.dump([SCENE], f)


# -------------------------------------------------------------- unit bits
def test_read_ply_mesh_binary_and_ascii(tmp_path):
    verts, faces = _plane_mesh()
    _write_ply_binary(tmp_path / "m.ply", verts, faces)
    v, fc = read_ply_mesh(str(tmp_path / "m.ply"))
    np.testing.assert_allclose(v, verts, atol=1e-6)
    np.testing.assert_array_equal(fc, faces)

    with open(tmp_path / "a.ply", "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for vv in verts:
            f.write(" ".join(str(x) for x in vv) + "\n")
        for ff in faces:
            f.write("3 " + " ".join(str(int(x)) for x in ff) + "\n")
    v, fc = read_ply_mesh(str(tmp_path / "a.ply"))
    np.testing.assert_allclose(v, verts, atol=1e-6)
    np.testing.assert_array_equal(fc, faces)


def test_pose_from_qwxyz_txyz_inverts_world2cam():
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(1)
    R = Rotation.from_rotvec(rng.randn(3) * 0.3)
    t = rng.randn(3)
    q = R.as_quat()  # x y z w
    cam2world = pose_from_qwxyz_txyz(
        [q[3], q[0], q[1], q[2], t[0], t[1], t[2]])
    w2c = np.eye(4)
    w2c[:3, :3] = R.as_matrix()
    w2c[:3, 3] = t
    np.testing.assert_allclose(cam2world, np.linalg.inv(w2c), atol=1e-9)


def test_render_depth_plane_and_far_clip():
    verts, faces = _plane_mesh(z=2.0)
    K = np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]])
    depth = render_depth(verts, faces, np.eye(4), K, H, W)
    assert depth.shape == (H, W)
    covered = depth > 0
    assert covered.mean() > 0.9
    np.testing.assert_allclose(depth[covered], 2.0, atol=1e-3)

    far_depth = render_depth(
        *_plane_mesh(z=ZFAR + 5.0, half=200.0), np.eye(4), K, H, W)
    assert (far_depth == 0).all()  # zfar clip (render.yml: zfar 20)


def test_undistort_zero_distortion_pinhole_identity():
    rng = np.random.RandomState(2)
    rgb = rng.randint(0, 255, (H, W, 3), np.uint8)
    mask = np.full((H, W), 255, np.uint8)
    intr = ["OPENCV", float(W), float(H), FX, FY, W / 2, H / 2,
            0.0, 0.0, 0.0, 0.0]
    new_K, rgb_u, mask_u = undistort_image(intr, rgb, mask)
    # zero distortion + alpha=1 + centered pp: the remap is (near-)identity
    assert (mask_u == 255).all()
    inner = (slice(2, -2), slice(2, -2))
    assert np.abs(rgb_u[inner].astype(int) - rgb[inner].astype(int)
                  ).mean() < 2.0
    np.testing.assert_allclose(np.diag(new_K)[:2], [FX, FY], rtol=1e-5)


def test_undistort_fisheye_centers_pp():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 255, (H, W, 3), np.uint8)
    mask = np.full((H, W), 255, np.uint8)
    intr = ["OPENCV_FISHEYE", float(W), float(H), FX, FY,
            W / 2 + 3.0, H / 2 - 2.0, 0.0, 0.0, 0.0, 0.0]
    new_K, rgb_u, mask_u = undistort_image(intr, rgb, mask)
    # preprocess_scannetpp.py:165-167 re-centers the principal point
    np.testing.assert_allclose(new_K[0, 2], W / 2)
    np.testing.assert_allclose(new_K[1, 2], H / 2)


# ------------------------------------------------------------- end to end
def test_scannetpp_roundtrip_through_pretrain_loader(tmp_path):
    raw = tmp_path / "raw"
    pairsdir = tmp_path / "pairs"
    out = tmp_path / "processed"
    _make_raw_scene(raw, pairsdir)

    from gd3d.cli.preprocess import main as preprocess_main

    preprocess_main(["--dataset", "scannetpp", "--raw-dir", str(raw),
                     "--pairs-dir", str(pairsdir), "--output-dir",
                     str(out), "--target-resolution", "64"])

    scene_out = out / SCENE
    assert (scene_out / "images" / "DSC00001.jpg").exists()
    assert (scene_out / "images" / "frame_000001.jpg").exists()
    meta = np.load(scene_out / "scene_metadata.npz")
    assert list(meta["images"]) == ["DSC00001", "DSC00002", "frame_000001"]
    assert meta["trajectories"].shape == (3, 4, 4)
    np.testing.assert_allclose(
        meta["trajectories"][1][0, 3], 0.05, atol=1e-6)

    # rendered depth decodes to the 2 m plane wherever covered
    dep = np.asarray(Image.open(scene_out / "depth" / "DSC00001.png"))
    assert dep.dtype == np.uint16
    covered = dep > 0
    assert covered.mean() > 0.5
    np.testing.assert_allclose(
        dep[covered].astype(np.float32) / 1000.0, 2.0, atol=2e-3)

    allmeta = np.load(out / "all_metadata.npz")
    assert allmeta["pairs"].shape == (2, 3)
    assert list(allmeta["sceneids"]) == [0, 0, 0]

    from gd3d.data.stereo_views import ScanNetppViews, views_pretrain_batch

    ds = ScanNetppViews(str(out), resolution=(48, 48), seed=7,
                        split="train")
    assert len(ds) == 2  # one entry per precomputed pair
    v1, v2 = ds[0]
    assert v1["img"].shape == (48, 48, 3)
    assert v1["valid_mask"].any()
    assert v1["is_metric_scale"] is True
    np.testing.assert_allclose(
        v1["depthmap"][v1["valid_mask"]], 2.0, atol=5e-3)

    batch = views_pretrain_batch(ds, [0, 1], np.random.RandomState(0),
                                 n_corres=64)
    assert batch["gt1"]["valid_corres"].any(), (
        "no valid correspondences survived the raw->tree->loader chain")
    assert batch["gt1"]["is_metric_scale"].all()


def test_merge_offsets_pair_indices(tmp_path):
    for i, scene in enumerate(("sA", "sB")):
        d = tmp_path / scene
        d.mkdir()
        np.savez(d / "scene_metadata.npz",
                 trajectories=np.tile(np.eye(4), (3, 1, 1)),
                 intrinsics=np.tile(np.eye(3), (3, 1, 1)),
                 images=np.array([f"{scene}_{j}" for j in range(3)]),
                 pairs=np.array([[0, 1, 0.5], [1, 2, 0.5]]))
    merge_scene_metadata(str(tmp_path), ["sA", "sB"])
    m = np.load(tmp_path / "all_metadata.npz")
    np.testing.assert_array_equal(
        m["pairs"][:, :2], [[0, 1], [1, 2], [3, 4], [4, 5]])
    assert list(m["counts"]) == [0, 3]
    assert list(m["sceneids"]) == [0] * 3 + [1] * 3
