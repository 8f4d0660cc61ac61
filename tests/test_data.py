"""Data layer: loaders against fabricated on-disk datasets + image-prep
parity with the reference formats."""
import json
import pickle

import numpy as np
import pytest
from PIL import Image

from gd3d.data.images import load_image_mast3r, load_images_vggt
from gd3d.data.loader import PrefetchLoader, collate, pad_keypoints
from gd3d.data.objaverse import (
    AugmentedCorrDataset,
    ObjaverseCorrDataset,
    ObjaverseMASt3RDataset,
)
from gd3d.data.scannetpp import ScanNetPPDataset, is_co_view_transform


def test_load_image_mast3r_shapes():
    # landscape 640x480 -> long side 512 -> 512x384 (/16 divisible)
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (480, 640, 3), np.uint8)
    )
    out = load_image_mast3r(img, 512)
    assert out["img"].shape == (384, 512, 3)
    assert tuple(out["true_shape"]) == (384, 512)
    assert -1.0 <= out["img"].min() and out["img"].max() <= 1.0

    # square 512 -> 3:4 crop => 384x512 (image.py:113-114)
    sq = Image.fromarray(
        np.random.RandomState(1).randint(0, 255, (512, 512, 3), np.uint8)
    )
    out = load_image_mast3r(sq, 512)
    assert out["img"].shape == (384, 512, 3)


def test_load_images_vggt_crop():
    imgs = [
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (400, 600, 3), np.uint8)
        )
        for i in range(2)
    ]
    arr = load_images_vggt(imgs)
    # width 518, height round(400*518/600/14)*14 = 350
    assert arr.shape == (2, 350, 518, 3)
    assert 0.0 <= arr.min() and arr.max() <= 1.0


def _make_objaverse(tmp_path, n_objs=2, n_views=3):
    poses = []
    for k in range(n_views):
        E = np.eye(4)
        E[2, 3] = 2.0 + 0.1 * k
        poses.append(E)
    poses = np.stack(poses)
    objs = []
    rng = np.random.RandomState(0)
    for o in range(n_objs):
        name = f"000-{o:03d}/obj{o}"
        d = tmp_path / name
        d.mkdir(parents=True)
        for i in range(n_views):
            import cv2

            rgb = rng.randint(0, 255, (512, 512, 3), np.uint8)
            cv2.imwrite(str(d / f"color_{i:06d}.png"), rgb)
            depth = (rng.rand(512, 512) * 3000 + 500).astype(np.uint16)
            cv2.imwrite(str(d / f"depth_{i:06d}.png"), depth)
            mask = np.zeros((512, 512), np.uint8)
            mask[100:400, 150:420] = 255
            cv2.imwrite(str(d / f"mask_{i:06d}.png"), mask)
        objs.append(name)
    return objs, poses


def test_objaverse_corr_dataset(tmp_path):
    objs, poses = _make_objaverse(tmp_path)
    ds = ObjaverseCorrDataset(str(tmp_path), objs, poses, num_kps=64, seed=0)
    s = ds[0]
    assert s["rgb_1"].shape == (512, 512, 3)
    assert s["pts2d_1"].shape == (64, 2)
    assert s["pts3d_1"].shape == (64, 3)
    aug = AugmentedCorrDataset(ds, seed=1)
    s2 = aug[0]
    assert s2["pts2d_1"].shape == (64, 2)
    assert s2["valid_1"].shape == (64,)


def test_objaverse_mast3r_dataset(tmp_path):
    objs, poses = _make_objaverse(tmp_path)
    ds = ObjaverseMASt3RDataset(str(tmp_path), objs, seed=0)
    s = ds[0]
    assert s["rgb_mast3r_1"].shape == (384, 512, 3)  # square -> 3:4 crop
    assert s["depth_1"].max() <= 1.0
    assert s["intrinsic"].shape == (3, 3)


def test_scannetpp_dataset(tmp_path):
    root = tmp_path / "snpp"
    scene = "scene0"
    (root / "scenes" / scene / "images").mkdir(parents=True)
    (root / "metadata").mkdir(parents=True)
    rng = np.random.RandomState(0)
    frames = []
    names = []
    for i in range(3):
        name = f"frame{i:03d}"
        names.append(f"{scene}_{name}")
        Image.fromarray(
            rng.randint(0, 255, (300, 400, 3), np.uint8)
        ).save(root / "scenes" / scene / "images" / f"{name}.JPG")
        E = np.eye(4)
        E[0, 3] = 0.1 * i  # within 1 m
        frames.append({"file_path": f"{name}.jpg", "transform_matrix": E.tolist()})
    with open(root / "scenes" / scene / "transforms_train.json", "w") as f:
        json.dump(
            {"fl_x": 400.0, "fl_y": 400.0, "cx": 200.0, "cy": 150.0,
             "w": 400, "h": 300, "frames": frames},
            f,
        )
    np.savetxt(root / "metadata" / "train_samples_all.txt", names, fmt="%s")

    ds = ScanNetPPDataset(str(root), num=10, length=4, seed=0)
    s = ds[0]
    assert s["rgb_1"].shape == (512, 512, 3)
    assert s["rgb_mast3r_1"].shape[1] == 512  # width 512
    assert s["intrinsic"][0, 0] == pytest.approx(400.0 * 512 / 400)
    # pair cache was written
    assert (root / "metadata" / "train_image_pairs.npy").exists()


def test_co_view_filter():
    A = np.eye(4)
    B = np.eye(4)
    B[0, 3] = 0.5
    assert is_co_view_transform(A, B)
    B[0, 3] = 5.0
    assert not is_co_view_transform(A, B)


def test_prefetch_loader_and_padding():
    data = [
        {"x": np.full((3,), i, np.float32), "name": f"s{i}"} for i in range(8)
    ]
    loader = PrefetchLoader(data, batch_size=4, steps_per_epoch=3, seed=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (4, 3)
    assert "name" not in batches[0]

    kps, pts, valid = pad_keypoints(
        np.ones((5, 2), np.float32), np.ones((5, 3), np.float32), 8
    )
    assert kps.shape == (8, 2) and valid.sum() == 5
