"""BlendedMVS / StaticThings3D / MegaDepth raw->tree preprocessors
(gd3d/data/preprocess_mvs.py): format readers (PFM, .float3, cam txt,
COLMAP manhattan) and full fabricated-raw-layout -> loader roundtrips."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from gd3d.data.preprocess_mvs import (
    load_blendedmvs_cam,
    load_pfm,
    read_float3,
)


# -------------------------------------------------------------- writers
def _write_pfm(path, arr):
    """Pf float map, bottom-up scanlines, little-endian (scale -1)."""
    arr = np.asarray(arr, "<f4")
    with open(path, "wb") as f:
        f.write(b"Pf\n")
        f.write(f"{arr.shape[1]} {arr.shape[0]}\n".encode())
        f.write(b"-1.0\n")
        f.write(np.ascontiguousarray(arr[::-1]).tobytes())


def _write_float3(path, arr):
    arr = np.asarray(arr, np.float32)
    with open(path, "wb") as f:
        f.write(b"float\n")
        f.write(f"{arr.ndim}\n".encode())
        for d in arr.shape[::-1]:  # fastest-varying first
            f.write(f"{d}\n".encode())
        arr.tofile(f)


def test_pfm_roundtrip(tmp_path):
    d = np.random.default_rng(0).random((12, 16)).astype(np.float32)
    _write_pfm(tmp_path / "d.pfm", d)
    np.testing.assert_array_equal(load_pfm(str(tmp_path / "d.pfm")), d)


def test_float3_roundtrip(tmp_path):
    for shape in ((3, 3), (4, 4), (10, 16)):
        d = np.random.default_rng(1).random(shape).astype(np.float32)
        _write_float3(tmp_path / "d.float3", d)
        np.testing.assert_array_equal(
            read_float3(str(tmp_path / "d.float3")), d)


def test_blendedmvs_cam_txt(tmp_path):
    rng = np.random.default_rng(2)
    c2w = np.eye(4)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    w2c = np.linalg.inv(c2w)
    K = np.array([[70.0, 0, 32], [0, 70.0, 24], [0, 0, 1]])
    with open(tmp_path / "cam.txt", "w") as f:
        f.write("extrinsic\n")
        for row in w2c:
            f.write(" ".join(str(v) for v in row) + "\n")
        f.write("\nintrinsic\n")
        for row in K:
            f.write(" ".join(str(v) for v in row) + "\n")
        f.write("\n425.0 2.5\n")  # depth range tail, ignored
    Kr, R, t = load_blendedmvs_cam(str(tmp_path / "cam.txt"))
    np.testing.assert_allclose(Kr, K)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-7)
    np.testing.assert_allclose(t, [1, 2, 3], atol=1e-7)


# ---------------------------------------------------------- roundtrips
def test_blendedmvs_raw_to_tree(tmp_path):
    from gd3d.cli.preprocess import main
    from gd3d.data.stereo_views import BlendedMVSViews

    rng = np.random.default_rng(3)
    raw, out = tmp_path / "raw", tmp_path / "out"
    seqh, seql = 0, 5
    seq = f"{seqh:08x}{seql:016x}"
    for sub in ("cams", "blended_images", "rendered_depth_maps"):
        os.makedirs(raw / seq / sub)
    w, h = 64, 48  # H*4 == W*3
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]])
    for i in range(2):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            raw / seq / "blended_images" / f"{i:08n}.jpg")
        _write_pfm(raw / seq / "rendered_depth_maps" / f"{i:08n}.pfm",
                   rng.random((h, w)) * 2 + 1)
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * i, 0, 0]
        with open(raw / seq / "cams" / f"{i:08n}_cam.txt", "w") as f:
            f.write("extrinsic\n")
            for row in np.linalg.inv(pose):
                f.write(" ".join(str(v) for v in row) + "\n")
            f.write("\nintrinsic\n")
            for row in K:
                f.write(" ".join(str(v) for v in row) + "\n")
    (raw / seq / "cams" / "pair.txt").write_text("")  # must be skipped
    rec = np.dtype([("seq_high", "<i8"), ("seq_low", "<i8"),
                    ("im1", "<i4"), ("im2", "<i4"), ("score", "<f4")])
    np.save(tmp_path / "pairs.npy",
            np.array([(seqh, seql, 0, 1, 0.9)], rec))

    main(["--dataset", "blendedmvs", "--raw-dir", str(raw),
          "--pairs-dir", str(tmp_path / "pairs.npy"),
          "--output-dir", str(out)])

    # frames at (512, 384) cover-rescale of 64x48 -> exactly 512x384
    img = Image.open(out / seq / f"{0:08n}.jpg")
    assert img.size == (512, 384)
    cam = np.load(out / seq / f"{1:08n}.npz")
    np.testing.assert_allclose(cam["t_cam2world"], [0.1, 0, 0],
                               atol=1e-6)
    # focal scaled by the 8x cover factor
    np.testing.assert_allclose(cam["intrinsics"][0, 0], 70.0 * 8,
                               rtol=1e-6)
    ds = BlendedMVSViews(str(out), split=None, resolution=(48, 32),
                         seed=13)
    v1, v2 = ds[0]
    assert v1["img"].shape == (32, 48, 3) and v1["valid_mask"].any()
    d = v1["depthmap"][v1["valid_mask"]]
    assert 0.9 < d.min() and d.max() < 3.1


def test_staticthings3d_raw_to_tree(tmp_path):
    from gd3d.cli.preprocess import main
    from gd3d.data.stereo_views import StaticThings3DViews

    rng = np.random.default_rng(4)
    raw, out = tmp_path / "raw", tmp_path / "out"
    rel = os.path.join("TRAIN", "A", "0000")
    os.makedirs(raw / "intrinsics" / rel)
    K = np.array([[500.0, 0, 480], [0, 500.0, 270], [0, 0, 1]],
                 np.float32)
    depth = (rng.random((540, 960)) * 30 + 5).astype(np.float32)
    for cam in ("left", "right"):
        for sub in ("poses", "depths", "frames_cleanpass",
                    "frames_finalpass"):
            os.makedirs(raw / sub / rel / cam, exist_ok=True)
        for n in range(6, 16):
            num = f"{n:04d}"
            _write_float3(raw / "intrinsics" / rel / f"{num}.float3", K)
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = [0.01 * n, 0, 0]
            _write_float3(raw / "poses" / rel / cam / f"{num}.float3",
                          np.linalg.inv(pose))
            _write_float3(raw / "depths" / rel / cam / f"{num}.float3",
                          depth)
            img = rng.integers(0, 255, (540, 960, 3), dtype=np.uint8)
            for sub in ("frames_cleanpass", "frames_finalpass"):
                Image.fromarray(img).save(
                    raw / sub / rel / cam / f"{num}.png")
    rec = np.dtype([("scene", "S2"), ("seq", "<i4"), ("cam1", "S1"),
                    ("im1", "<i4"), ("cam2", "S1"), ("im2", "<i4")])
    np.save(tmp_path / "pairs.npy",
            np.array([(b"A", 0, b"l", 6, b"r", 7)], rec))

    main(["--dataset", "staticthings3d", "--raw-dir", str(raw),
          "--pairs-dir", str(tmp_path / "pairs.npy"),
          "--output-dir", str(out)])

    img = Image.open(out / rel / "left" / "0006_clean.jpg")
    # cover semantics: 960x540 scaled so BOTH dims reach the (512, 384)
    # target -> floor(960 * 384/540) x 384 (the loader crops later)
    assert img.size == (682, 384)
    cam = np.load(out / rel / "left" / "0007.npz")
    np.testing.assert_allclose(cam["cam2world"][:3, 3], [0.07, 0, 0],
                               atol=1e-6)
    ds = StaticThings3DViews(str(out), mask_bg=False,
                             resolution=(48, 32), seed=14)
    v1, v2 = ds[0]
    assert v1["valid_mask"].any()
    d = v1["depthmap"][v1["valid_mask"]]
    assert 4.0 < d.min() and d.max() < 36.0


def test_megadepth_raw_to_tree(tmp_path):
    import h5py

    from gd3d.cli.preprocess import main
    from gd3d.data.stereo_views import MegaDepthViews

    rng = np.random.default_rng(5)
    raw, out = tmp_path / "raw", tmp_path / "out"
    scene, subscene = "0001", "0"
    sfm = raw / scene / "sparse" / "manhattan" / subscene
    dense = raw / scene / ("dense" + subscene)
    os.makedirs(sfm)
    os.makedirs(dense / "imgs")
    os.makedirs(dense / "depths")
    w, h = 96, 64
    with open(sfm / "cameras.txt", "w") as f:
        f.write("# h\n# h\n# h\n")
        f.write(f"1 SIMPLE_RADIAL {w} {h} 70.0 {w / 2} {h / 2} 0.0\n")
    tags = ["im_a.jpg", "im_b.jpg"]
    with open(sfm / "images.txt", "w") as f:
        f.write("# h\n# h\n# h\n# h\n")
        for i, tag in enumerate(tags):
            f.write(f"{i + 1} 1 0 0 0 {0.1 * i} 0 0 1 {tag}\n")
            f.write("1 2 -1\n")  # 2D point observations line
    for tag in tags:
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(dense / "imgs" / tag)
        with h5py.File(dense / "depths" / (tag[:-4] + ".h5"), "w") as f:
            f.create_dataset(
                "depth", data=(rng.random((h, w)) * 2 + 1).astype(
                    np.float32))
    rec = np.dtype([("scene_id", "<i8"), ("im1_id", "<i8"),
                    ("im2_id", "<i8"), ("score", "<f4")])
    np.savez(tmp_path / "pairs.npz",
             scenes=np.array([f"{scene} {subscene}"]),
             images=np.array(tags),
             pairs=np.array([(0, 0, 1, 0.5)], rec))

    main(["--dataset", "megadepth", "--raw-dir", str(raw),
          "--pairs-dir", str(tmp_path / "pairs.npz"),
          "--output-dir", str(out)])

    # force=False: a 96x64 input is NOT upscaled to (800, 600)
    img = Image.open(out / scene / subscene / "im_a.jpg.jpg")
    assert img.size == (w, h)
    cam = np.load(out / scene / subscene / "im_b.jpg.npz")
    np.testing.assert_allclose(cam["cam2world"][:3, 3], [-0.1, 0, 0],
                               atol=1e-6)
    # the pairs file doubles as the loader's all_metadata.npz
    ds = MegaDepthViews(str(out), split="train", resolution=(48, 32),
                        seed=15)
    assert len(ds) == 1
    v1, v2 = ds[0]
    assert v1["img"].shape == (32, 48, 3) and v1["valid_mask"].any()
    d = v1["depthmap"][v1["valid_mask"]]
    assert 0.9 < d.min() and d.max() < 3.1
