"""Stereo-view dataset machinery (gd3d/data/stereo_views.py).

Covers the crop/rescale-with-intrinsics math (reference-DIRECT vs the
actual dust3r.datasets.utils.cropping module), the Co3D-v2 layout loader
on a synthetic on-disk tree, the easy_dataset combinators, and the
pretrain-batch bridge's reprojection correspondences."""
import json
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

from gd3d.data.stereo_views import (
    CatViews,
    Co3dViews,
    MulViews,
    ResizedViews,
    StereoViews,
    bbox_from_K_in_out,
    camera_matrix_of_crop,
    crop_resize_principal,
    crop_view,
    rescale_view,
    transpose_to_landscape,
    unproject_depth,
    views_pretrain_batch,
)


def _rand_view(rng, w=97, h=71):
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    depth = (rng.random((h, w)) * 4 + 0.5).astype(np.float32)
    K = np.array([[80.0, 0, w / 2 + 1.3], [0, 82.0, h / 2 - 0.7],
                  [0, 0, 1]], np.float32)
    return img, depth, K


# ------------------------------------------------- reference-direct math
@pytest.mark.slow
def test_crop_math_matches_reference_cropping_module():
    sys.path.append("/root/reference/dust3r")
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    if "torchvision" not in sys.modules:
        # dust3r.datasets.__init__ pulls torchvision only for ImgNorm;
        # the cropping math under test never touches it
        tv = types.ModuleType("torchvision")
        tvf = types.ModuleType("torchvision.transforms")
        class _Any(types.ModuleType):
            def __getattr__(self, name):  # Compose/ToTensor/ColorJitter/...
                if name.startswith("__"):  # keep import/inspect machinery sane
                    raise AttributeError(name)
                return lambda *a, **k: None

        tvf = _Any("torchvision.transforms")
        tv.transforms = tvf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvf
    import dust3r.datasets.utils.cropping as ref

    rng = np.random.default_rng(0)
    img, depth, K = _rand_view(rng)

    r_img, r_depth, r_K = ref.rescale_image_depthmap(
        Image.fromarray(img), depth.copy(), K.copy(), np.array([64, 48]))
    g_img, g_depth, g_K = rescale_view(img, depth.copy(), K.copy(), (64, 48))
    assert np.array_equal(np.asarray(r_img), np.asarray(g_img))
    assert np.array_equal(r_depth, g_depth)
    np.testing.assert_allclose(r_K, g_K, rtol=0, atol=1e-5)

    K2r = ref.camera_matrix_of_crop(r_K, r_img.size, (48, 40))
    K2g = camera_matrix_of_crop(g_K, g_img.size, (48, 40))
    np.testing.assert_allclose(K2r, K2g, rtol=0, atol=1e-5)

    bb_r = ref.bbox_from_intrinsics_in_out(r_K, K2r, (48, 40))
    bb_g = bbox_from_K_in_out(g_K, K2g, (48, 40))
    assert tuple(bb_r) == tuple(bb_g)

    c_img, c_depth, c_K = ref.crop_image_depthmap(
        r_img, r_depth, r_K, bb_r)
    d_img, d_depth, d_K = crop_view(g_img, g_depth, g_K, bb_g)
    assert np.array_equal(np.asarray(c_img), np.asarray(d_img))
    assert np.array_equal(c_depth, d_depth)
    np.testing.assert_allclose(c_K, d_K, rtol=0, atol=1e-5)


# --------------------------------------------------- pipeline geometry
def test_crop_resize_principal_preserves_projection():
    """After the full crop/rescale pipeline, unprojecting the output
    depth with the output K and reprojecting must land on the pixel
    grid — the property that makes pointmaps consistent with pixels."""
    rng = np.random.default_rng(1)
    img, depth, K = _rand_view(rng, w=120, h=90)
    out_img, out_depth, out_K = crop_resize_principal(
        img, depth, K, (64, 48), rng)
    assert out_img.size == (64, 48)
    assert out_depth.shape == (48, 64)
    pts, valid = unproject_depth(out_depth, out_K, None)
    assert valid.all()
    uv = pts @ out_K.T
    uv = uv[..., :2] / uv[..., 2:3]
    u, v = np.meshgrid(np.arange(64), np.arange(48))
    np.testing.assert_allclose(uv[..., 0], u, atol=1e-3)
    np.testing.assert_allclose(uv[..., 1], v, atol=1e-3)


def test_transpose_to_landscape_swaps_axes_and_intrinsics():
    h, w = 32, 20  # portrait
    view = dict(
        img=np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3),
        depthmap=np.ones((h, w), np.float32),
        valid_mask=np.ones((h, w), bool),
        pts3d=np.zeros((h, w, 3), np.float32),
        camera_intrinsics=np.array([[10.0, 0, 5], [0, 12.0, 9], [0, 0, 1]],
                                   np.float32),
        true_shape=np.int32((h, w)),
    )
    transpose_to_landscape(view)
    assert view["img"].shape == (w, h, 3)
    assert tuple(view["true_shape"]) == (w, h)
    K = view["camera_intrinsics"]
    # the reference permutes the ROWS (base_stereo_view_dataset.py:219):
    # new row 0 is the old y-row, so the matrix maps (x,y,z) to the
    # transposed pixel coordinates (old v, old u)
    assert K[0, 1] == 12.0 and K[1, 0] == 10.0
    assert K[0, 2] == 9 and K[1, 2] == 5


# --------------------------------------------------------- Co3D layout
def _make_co3d_tree(root, n_frames=8, w=80, h=60):
    rng = np.random.default_rng(7)
    base = os.path.join(root, "apple", "seq1")
    for sub in ("images", "depths", "masks"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]], np.float32)
    for i in range(n_frames):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(base, "images", f"frame{i:06n}.jpg"))
        # orbit poses around the origin, cam2world
        ang = 2 * np.pi * i / n_frames
        c, s = np.cos(ang), np.sin(ang)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pose[:3, 3] = [2 * s, 0, -2 * c]
        np.savez(os.path.join(base, "images", f"frame{i:06n}.npz"),
                 camera_intrinsics=K, camera_pose=pose, maximum_depth=4.0)
        depth16 = (rng.random((h, w)) * 0.4 + 0.4) * 65535
        Image.fromarray(depth16.astype(np.uint16)).save(
            os.path.join(base, "depths", f"frame{i:06n}.jpg.geometric.png"))
        mask = np.zeros((h, w), np.uint8)
        mask[10:-10, 14:-14] = 255
        Image.fromarray(mask).save(
            os.path.join(base, "masks", f"frame{i:06n}.png"))
    with open(os.path.join(root, "selected_seqs_train.json"), "w") as f:
        json.dump({"apple": {"seq1": list(range(n_frames))}}, f)


def test_co3d_views_roundtrip(tmp_path):
    _make_co3d_tree(str(tmp_path))
    ds = Co3dViews(str(tmp_path), split="train", resolution=(48, 32), seed=3)
    assert len(ds) == len(ds.combinations)
    v1, v2 = ds[0]
    for view in (v1, v2):
        assert view["img"].shape == (32, 48, 3)
        assert view["img"].min() >= -1.0 and view["img"].max() <= 1.0
        assert view["depthmap"].shape == (32, 48)
        assert view["pts3d"].shape == (32, 48, 3)
        # mask_bg=True zeroed the border band -> invalid there
        assert not view["valid_mask"][0, 0]
        assert view["valid_mask"].any()
        # pts3d consistent with K/pose: reproject through the camera
        w2c = np.linalg.inv(view["camera_pose"])
        cam = view["pts3d"] @ w2c[:3, :3].T + w2c[:3, 3]
        uv = cam @ view["camera_intrinsics"].T
        with np.errstate(invalid="ignore", divide="ignore"):
            uv = uv[..., :2] / uv[..., 2:3]
        u, v = np.meshgrid(np.arange(48), np.arange(32))
        m = view["valid_mask"]
        np.testing.assert_allclose(uv[..., 0][m], u[m], atol=1e-2)
        np.testing.assert_allclose(uv[..., 1][m], v[m], atol=1e-2)
    # deterministic per (seed, idx)
    w1, _ = ds[0]
    np.testing.assert_array_equal(w1["img"], v1["img"])


def _make_wildrgbd_tree(root, n_frames=8, w=80, h=60):
    rng = np.random.default_rng(9)
    base = os.path.join(root, "apple", "seq1")
    for sub in ("rgb", "depth", "masks", "metadata"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]], np.float32)
    for i in range(n_frames):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(base, "rgb", f"{i:0>5d}.jpg"))
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1 * i, 0, -2]
        np.savez(os.path.join(base, "metadata", f"{i:0>5d}.npz"),
                 camera_intrinsics=K, camera_pose=pose)
        depth_mm = (rng.random((h, w)) * 800 + 800).astype(np.uint16)
        Image.fromarray(depth_mm).save(
            os.path.join(base, "depth", f"{i:0>5d}.png"))
        mask = np.full((h, w), 255, np.uint8)
        Image.fromarray(mask).save(
            os.path.join(base, "masks", f"{i:0>5d}.png"))
    with open(os.path.join(root, "selected_seqs_train.json"), "w") as f:
        json.dump({"apple": {"seq1": list(range(n_frames))}}, f)


def test_wildrgbd_views_metric_depth(tmp_path):
    from gd3d.data.stereo_views import WildRGBDViews

    _make_wildrgbd_tree(str(tmp_path))
    ds = WildRGBDViews(str(tmp_path), split="train", resolution=(48, 32),
                       seed=2)
    v1, v2 = ds[3]
    assert v1["dataset"] == "WildRGBD"
    # depth decoded at scale 1000 (wildrgbd.py:36-41): mm 800-1600 -> m
    d = v1["depthmap"][v1["valid_mask"]]
    assert 0.7 < d.min() and d.max() < 1.7
    assert v1["img"].shape == (32, 48, 3)


def test_scannetpp_views_roundtrip(tmp_path):
    from gd3d.data.stereo_views import ScanNetppViews

    rng = np.random.default_rng(11)
    w, h, n = 80, 60, 4
    scene = "scene0"
    os.makedirs(tmp_path / scene / "images", exist_ok=True)
    os.makedirs(tmp_path / scene / "depth", exist_ok=True)
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]], np.float32)
    names, poses = [], []
    for i in range(n):
        name = f"frame_{i:04d}"
        names.append(name)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / scene / "images" / f"{name}.jpg")
        depth_mm = (rng.random((h, w)) * 900 + 600).astype(np.uint16)
        Image.fromarray(depth_mm).save(
            tmp_path / scene / "depth" / f"{name}.png")
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0, 0.05 * i, -1]
        poses.append(pose)
    np.savez(tmp_path / "all_metadata.npz",
             scenes=np.array([scene]),
             sceneids=np.zeros(n, np.int64),
             images=np.array(names),
             intrinsics=np.stack([K] * n),
             trajectories=np.stack(poses),
             pairs=np.array([[0, 1], [1, 2], [2, 3]], np.int64))
    ds = ScanNetppViews(str(tmp_path), split="train", resolution=(48, 32),
                        seed=4)
    assert len(ds) == 3
    v1, v2 = ds[1]
    assert v1["instance"] == "1_1" and v2["instance"] == "1_2"
    assert v1["img"].shape == (32, 48, 3)
    assert v1["valid_mask"].all()  # all synthetic depths > 0
    d = v1["depthmap"]
    assert 0.5 < d.min() and d.max() < 1.6  # mm -> m decode


# -------------------------------------------------------- combinators
class _TinyViews(StereoViews):
    def __init__(self, n, **kw):
        self.scenes = list(range(n))
        super().__init__(**kw)

    def _get_views(self, idx, resolution, rng):
        w, h = resolution
        img = np.full((h, w, 3), idx % 255, np.uint8)
        depth = np.ones((h, w), np.float32)
        K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                     np.float32)
        pose = np.eye(4, dtype=np.float32)
        return [dict(img=img, depthmap=depth, camera_intrinsics=K,
                     camera_pose=pose, dataset="tiny", label="l",
                     instance=str(idx)) for _ in range(2)]


def test_combinators_match_reference_semantics():
    a, b = _TinyViews(5, resolution=(16, 16)), _TinyViews(3,
                                                          resolution=(16, 16))
    assert len(2 * a) == 10 and len(a + b) == 8
    cat = a + b
    assert isinstance(cat, CatViews)
    # element 6 of the cat is element 1 of b
    v = cat[6]
    assert v[0]["instance"] == "1"
    mul = 2 * a
    assert isinstance(mul, MulViews)
    assert mul[7][0]["instance"] == "3"
    rs = 12 @ a
    assert isinstance(rs, ResizedViews) and len(rs) == 12
    rs.set_epoch(4)
    # easy_dataset.py:89-101 semantics: seed = epoch + 777, rotary extend
    ref = np.random.default_rng(seed=4 + 777).permutation(5)
    expect = np.concatenate([ref, ref, ref])[:12]
    np.testing.assert_array_equal(rs._idxs_mapping, expect)
    assert rs[0][0]["instance"] == str(expect[0])


# ----------------------------------------------------- pretrain bridge
def test_views_pretrain_batch_correspondences_reproject(tmp_path):
    _make_co3d_tree(str(tmp_path), n_frames=8)
    ds = Co3dViews(str(tmp_path), split="train", resolution=(48, 32),
                   seed=5, mask_bg=False)
    batch = views_pretrain_batch(ds, [0, 1], np.random.RandomState(0),
                                 n_corres=32)
    assert batch["img1"].shape == (2, 32, 48, 3)
    assert batch["gt1"]["corres"].shape == (2, 32, 2)
    assert batch["gt1"]["valid_corres"].shape == (2, 32)
    assert not batch["gt1"]["is_metric_scale"].any()
    # each valid correspondence's view-1 world point must land within a
    # pixel of its recorded view-2 coordinate
    for bi in range(2):
        vc = batch["gt1"]["valid_corres"][bi]
        if not vc.any():
            continue
        c1 = batch["gt1"]["corres"][bi][vc]
        c2 = batch["gt2"]["corres"][bi][vc]
        world = batch["gt1"]["pts3d"][bi][c1[:, 1], c1[:, 0]]
        w2c = np.linalg.inv(batch["gt2"]["camera_pose"][bi])
        # K of view 2 after the pipeline: recover from the batch's pts3d
        v2 = ds[1][1] if bi else ds[0][1]
        cam = world @ w2c[:3, :3].T + w2c[:3, 3]
        uv = cam @ v2["camera_intrinsics"].T
        uv = uv[:, :2] / uv[:, 2:3]
        assert np.all(np.abs(uv - c2) <= 1.0 + 1e-5)


def test_views_pretrain_batch_drives_pretrain_step(tmp_path):
    """End-to-end: a Co3D-layout batch runs through the actual jitted
    pretraining step (loss finite, params update)."""
    import jax
    import optax

    from gd3d.distill.pretrain import build_mast3r_pretrain_step
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3r, Mast3rConfig

    _make_co3d_tree(str(tmp_path), n_frames=8, w=80, h=60)
    ds = Co3dViews(str(tmp_path), split="train", resolution=(32, 32),
                   seed=5, mask_bg=False)
    batch = views_pretrain_batch(ds, [0], np.random.RandomState(0),
                                 n_corres=16)
    tiny = CrocoConfig(patch_size=16, enc_embed_dim=32, enc_depth=2,
                       enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                       dec_num_heads=2)
    model = Mast3r(Mast3rConfig(croco=tiny, local_feat_dim=6,
                                dpt_feature_dim=32, dpt_last_dim=16))
    params = model.init(jax.random.key(0), batch["img1"],
                        batch["img2"])["params"]
    tx = optax.adamw(1e-4)
    p1, _, metrics = build_mast3r_pretrain_step(model, tx)(
        params, tx.init(params), batch)
    assert np.isfinite(float(metrics["loss"]))


def test_pretrain_cli_co3d_smoke(tmp_path):
    """gd3d-pretrain --co3d-root: the CLI trains on a Co3D-layout tree."""
    from gd3d.cli.pretrain import main

    _make_co3d_tree(str(tmp_path / "co3d"), n_frames=8, w=80, h=60)
    main(["--output", str(tmp_path / "run"), "--co3d-root",
          str(tmp_path / "co3d"), "--steps", "2", "--tiny", "--img", "64",
          "--corres", "16"])
    lines = [json.loads(l) for l in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 2 and np.isfinite(lines[-1]["loss"])


# ------------------------------------- EXR-layout datasets (npy fallback)
def _write_frame(dirpath, stem, w, h, rng, depth=None, pose=None,
                 split_rt=False):
    """One preprocessed frame: jpg + float depth (.exr.npy fallback — this
    image's cv2 lacks the EXR codec) + camera npz."""
    os.makedirs(dirpath, exist_ok=True)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    Image.fromarray(img).save(os.path.join(dirpath, stem + ".jpg"))
    if depth is None:
        depth = (rng.random((h, w)) * 2 + 1).astype(np.float32)
    np.save(os.path.join(dirpath, stem + ".exr.npy"), depth)
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]],
                 np.float32)
    if pose is None:
        pose = np.eye(4, dtype=np.float32)
    if split_rt:  # BlendedMVS stores R/t separately
        np.savez(os.path.join(dirpath, stem + ".npz"), intrinsics=K,
                 R_cam2world=pose[:3, :3], t_cam2world=pose[:3, 3])
    else:
        np.savez(os.path.join(dirpath, stem + ".npz"), intrinsics=K,
                 cam2world=pose)
    return depth


def test_read_depth_float_npy_fallback(tmp_path):
    from gd3d.data.stereo_views import read_depth_float

    d = np.random.default_rng(0).random((6, 8)).astype(np.float32)
    np.save(tmp_path / "0000.exr.npy", d)
    np.testing.assert_array_equal(
        read_depth_float(str(tmp_path / "0000.exr")), d)
    with pytest.raises(IOError):
        read_depth_float(str(tmp_path / "missing.exr"))


def test_arkitscenes_views_roundtrip(tmp_path):
    from gd3d.data.stereo_views import ARKitScenesViews

    rng = np.random.default_rng(21)
    w, h, n = 80, 60, 3
    scene = "41069021"
    sdir = tmp_path / "Training" / scene
    os.makedirs(sdir / "vga_wide")
    os.makedirs(sdir / "lowres_depth")
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]],
                 np.float32)
    names, poses = [], []
    for i in range(n):
        name = f"{scene}_{i:.3f}.png"  # stored as .png, rgb saved as .jpg
        names.append(name)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            sdir / "vga_wide" / name.replace(".png", ".jpg"))
        depth_mm = (rng.random((h, w)) * 900 + 600).astype(np.uint16)
        Image.fromarray(depth_mm).save(sdir / "lowres_depth" / name)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.1 * i, 0, 0]
        poses.append(pose)
    np.savez(tmp_path / "Training" / "all_metadata.npz",
             scenes=np.array([scene]), sceneids=np.zeros(n, np.int64),
             images=np.array(names), intrinsics=np.stack([K] * n),
             trajectories=np.stack(poses),
             pairs=np.array([[0, 1], [1, 2]], np.int64))
    ds = ARKitScenesViews(str(tmp_path), split="train",
                          resolution=(48, 32), seed=6)
    assert ds.is_metric_scale and len(ds) == 2
    v1, v2 = ds[1]
    assert v1["dataset"] == "arkitscenes"
    assert v1["img"].shape == (32, 48, 3)
    d = v1["depthmap"][v1["valid_mask"]]
    assert 0.5 < d.min() and d.max() < 1.6  # mm -> m decode
    with pytest.raises(KeyError):
        ARKitScenesViews(str(tmp_path), split="val", resolution=(48, 32))


def test_blendedmvs_views_split_and_decode(tmp_path):
    from gd3d.data.stereo_views import BlendedMVSViews

    rng = np.random.default_rng(22)
    w, h = 80, 60
    rec = np.dtype([("seq_high", "<i8"), ("seq_low", "<i8"),
                    ("im1", "<i4"), ("im2", "<i4"), ("score", "<f4")])
    # seq_low 5 -> train (5 % 10 > 0); seq_low 10 -> val
    pairs = np.array([(0, 5, 0, 1, 0.9), (0, 10, 0, 1, 0.8)], rec)
    np.save(tmp_path / "blendedmvs_pairs.npy", pairs)
    for seql in (5, 10):
        seq_dir = tmp_path / f"{0:08x}{seql:016x}"
        for i in range(2):
            _write_frame(str(seq_dir), f"{i:08n}", w, h, rng,
                         split_rt=True)
    train = BlendedMVSViews(str(tmp_path), split="train",
                            resolution=(48, 32), seed=7)
    val = BlendedMVSViews(str(tmp_path), split="val",
                          resolution=(48, 32), seed=7)
    assert len(train) == 1 and len(val) == 1
    assert not train.is_metric_scale
    v1, v2 = train[0]
    assert v1["dataset"] == "BlendedMVS"
    assert v1["label"] == f"{0:08x}{5:016x}"
    assert v1["img"].shape == (32, 48, 3) and v1["valid_mask"].any()


def test_megadepth_views_heldout_split(tmp_path):
    from gd3d.data.stereo_views import MegaDepthViews

    rng = np.random.default_rng(23)
    w, h = 80, 60
    scenes = np.array(["0001 0", "0015 0"])
    images = np.array(["im_a", "im_b", "im_c", "im_d"])
    rec = np.dtype([("scene_id", "<i8"), ("im1_id", "<i8"),
                    ("im2_id", "<i8"), ("score", "<f4")])
    pairs = np.array([(0, 0, 1, 0.5), (1, 2, 3, 0.5)], rec)
    np.savez(tmp_path / "all_metadata.npz", scenes=scenes, images=images,
             pairs=pairs)
    for scene, ims in (("0001", ("im_a", "im_b")),
                       ("0015", ("im_c", "im_d"))):
        for im in ims:
            _write_frame(str(tmp_path / scene / "0"), im, w, h, rng)
    train = MegaDepthViews(str(tmp_path), split="train",
                           resolution=(48, 32), seed=8)
    val = MegaDepthViews(str(tmp_path), split="val",
                         resolution=(48, 32), seed=8)
    # 0015/0022 are the held-out scenes (megadepth.py:24-29)
    assert len(train) == 1 and len(val) == 1
    assert not train.is_metric_scale
    v1, _ = val[0]
    assert v1["dataset"] == "MegaDepth" and v1["label"] == "0015/0"
    v1, _ = train[0]
    assert v1["label"] == "0001/0" and v1["img"].shape == (32, 48, 3)


def test_staticthings3d_views_mask_bg(tmp_path):
    from gd3d.data.stereo_views import StaticThings3DViews

    rng = np.random.default_rng(24)
    w, h = 80, 60
    rec = np.dtype([("scene", "S2"), ("seq", "<i4"), ("cam1", "S1"),
                    ("im1", "<i4"), ("cam2", "S1"), ("im2", "<i4")])
    pairs = np.array([(b"A", 0, b"l", 6, b"r", 7)], rec)
    np.save(tmp_path / "staticthings_pairs.npy", pairs)
    # far background plane at depth 300 in the top rows
    depth = (rng.random((h, w)) * 50 + 10).astype(np.float32)
    depth[:10] = 300.0
    for cam in ("left", "right"):
        for i in (6, 7):
            d = str(tmp_path / "TRAIN" / "A" / "0000" / cam)
            _write_frame(d, f"{i:04n}", w, h, rng, depth=depth)
            # both random jpg variants must exist (staticthings3d.py:47)
            os.link(os.path.join(d, f"{i:04n}.jpg"),
                    os.path.join(d, f"{i:04n}_clean.jpg"))
            os.rename(os.path.join(d, f"{i:04n}.jpg"),
                      os.path.join(d, f"{i:04n}_final.jpg"))
    ds = StaticThings3DViews(str(tmp_path), mask_bg=True,
                             resolution=(48, 32), seed=9)
    assert not ds.is_metric_scale and len(ds) == 1
    v1, v2 = ds[0]
    assert v1["dataset"] == "StaticThings3D"
    assert v1["instance"].startswith("left_0006")
    assert v2["instance"].startswith("right_0007")
    # mask_bg=True zeroes depth > 200 -> those pixels invalid
    assert (v1["depthmap"] <= 200).all()
    assert not v1["valid_mask"].all() and v1["valid_mask"].any()
    nomask = StaticThings3DViews(str(tmp_path), mask_bg=False,
                                 resolution=(48, 32), seed=9)
    assert nomask[0][0]["valid_mask"].all()


def test_waymo_views_roundtrip(tmp_path):
    from gd3d.data.stereo_views import WaymoViews

    rng = np.random.default_rng(25)
    w, h = 80, 60
    np.savez(tmp_path / "waymo_pairs.npz",
             scenes=np.array(["segment-1"]),
             frames=np.array(["00000_1", "00001_1"]),
             pairs=np.array([[0, 0, 1]], np.int64))
    for f in ("00000_1", "00001_1"):
        _write_frame(str(tmp_path / "segment-1"), f, w, h, rng)
    ds = WaymoViews(str(tmp_path), resolution=(48, 32), seed=10)
    assert ds.is_metric_scale and len(ds) == 1
    v1, v2 = ds[0]
    assert v1["dataset"] == "Waymo" and v1["label"] == "segment-1"
    assert v1["img"].shape == (32, 48, 3) and v1["valid_mask"].any()


def test_pretrain_cli_arkit_smoke(tmp_path, monkeypatch):
    """gd3d-pretrain --arkit-root: the new loaders plug into the CLI's
    stereo-view path end-to-end."""
    from gd3d.cli.pretrain import main

    rng = np.random.default_rng(26)
    w, h, n = 80, 60, 3
    scene = "41069021"
    root = tmp_path / "arkit"
    sdir = root / "Training" / scene
    os.makedirs(sdir / "vga_wide")
    os.makedirs(sdir / "lowres_depth")
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]],
                 np.float32)
    names, poses = [], []
    for i in range(n):
        name = f"{scene}_{i:.3f}.png"
        names.append(name)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            sdir / "vga_wide" / name.replace(".png", ".jpg"))
        depth_mm = (rng.random((h, w)) * 900 + 600).astype(np.uint16)
        Image.fromarray(depth_mm).save(sdir / "lowres_depth" / name)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = [0.05 * i, 0, 0]
        poses.append(pose)
    np.savez(root / "Training" / "all_metadata.npz",
             scenes=np.array([scene]), sceneids=np.zeros(n, np.int64),
             images=np.array(names), intrinsics=np.stack([K] * n),
             trajectories=np.stack(poses),
             pairs=np.array([[0, 1], [1, 2]], np.int64))
    main(["--output", str(tmp_path / "run"), "--arkit-root", str(root),
          "--steps", "2", "--tiny", "--img", "64", "--corres", "16"])
    lines = [json.loads(l) for l in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 2 and np.isfinite(lines[-1]["loss"])


def test_habitat_views_roundtrip(tmp_path):
    from gd3d.data.stereo_views import HabitatViews

    rng = np.random.default_rng(27)
    w, h = 80, 60
    scene_rel = os.path.join("sceneA", "00000")
    data_dir = tmp_path / "sceneA"
    os.makedirs(data_dir)
    K = np.array([[70.0, 0, w / 2], [0, 70.0, h / 2], [0, 0, 1]])
    for i in range(1, 6):  # file indices start at 1 (habitat.py:61)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(data_dir / f"00000_{i}.jpeg")
        np.save(data_dir / f"00000_{i}_depth.exr.npy",
                (rng.random((h, w)) * 2 + 1).astype(np.float32))
        pose_R = np.eye(3)
        # view 2 stores a broken (non-finite) pose: items drawing it must
        # walk forward to view 3 (habitat.py:46-49)
        t = [np.nan] * 3 if i == 2 else [0.1 * i, 0.0, 0.0]
        with open(data_dir / f"00000_{i}_camera_params.json", "w") as f:
            json.dump({"camera_intrinsics": K.tolist(),
                       "R_cam2world": pose_R.tolist(),
                       "t_cam2world": t}, f)
    with open(tmp_path / "Habitat_1000000_scenes_train.txt", "w") as f:
        f.write(scene_rel + "\n")

    ds = HabitatViews(str(tmp_path), 1_000_000, split="train",
                      resolution=(48, 32), seed=16)
    assert not ds.is_metric_scale and len(ds) == 1
    # instances are 1..4; rng.choice(1) can land on the broken view 2
    # (0-based index 1 -> file _2): the walk must yield a finite pose
    for trial in range(6):
        ds.seed = 16 + trial
        v1, v2 = ds[0]
        assert v1["dataset"] == "Habitat"
        assert np.isfinite(v1["camera_pose"]).all()
        assert np.isfinite(v2["camera_pose"]).all()
        assert v1["instance"] == "00000_0"
    assert v1["img"].shape == (32, 48, 3) and v1["valid_mask"].any()
    # filter_scene narrows the list (habitat.py:30-37)
    ds.filter_scene("sceneA")
    assert len(ds.scenes) == 1
    with pytest.raises(AssertionError):
        ds.filter_scene("nope")
