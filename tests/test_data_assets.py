"""In-tree eval/render data assets (repo data/, see data/README.md).

The reference vendors the PF-PASCAL pair CSVs, the 42 BlenderProc poses and
the 10k Objaverse UID list under data/; gd3d ships them identically and the
PCK loader falls back to the vendored CSVs when the user's PF-PASCAL dir
has no copy.
"""
import os.path as osp

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
DATA = osp.join(REPO, "data")
REF = "/root/reference/data"

PASCAL_CATEGORIES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def test_pck_loader_falls_back_to_vendored_csvs(tmp_path):
    import pandas as pd

    from gd3d.eval.pck import resolve_pascal_csv

    for same_view, name in ((True, "test_pairs_pf_same_views.csv"),
                            (False, "test_pairs_pf_different_views.csv")):
        # empty PF-PASCAL dir -> the vendored in-tree copy
        csv = resolve_pascal_csv(str(tmp_path), same_view)
        assert csv == osp.join(DATA, name)
        data = pd.read_csv(csv)
        assert len(data) == 299
        cls_ids = data.iloc[:, 2].values.astype(int) - 1
        assert set(cls_ids) <= set(range(20))
        assert data.iloc[0, 0].startswith("PF-dataset-PASCAL/")
        # a user-provided copy wins over the vendored one
        (tmp_path / name).write_text(data.to_csv(index=False))
        assert resolve_pascal_csv(str(tmp_path), same_view) == \
            str(tmp_path / name)


def test_obj_poses_are_valid_extrinsics():
    poses = np.load(osp.join(DATA, "obj_poses.npy"))
    assert poses.shape == (42, 4, 4)
    R = poses[:, :3, :3]
    np.testing.assert_allclose(
        R @ np.transpose(R, (0, 2, 1)), np.tile(np.eye(3), (42, 1, 1)),
        atol=1e-6)
    np.testing.assert_allclose(
        poses[:, 3], np.tile([0, 0, 0, 1], (42, 1)), atol=1e-12)
    # cameras sit on a sphere around the object: camera centers -R^T t
    centers = -np.einsum("nij,nj->ni", np.transpose(R, (0, 2, 1)),
                         poses[:, :3, 3])
    radii = np.linalg.norm(centers, axis=1)
    assert radii.std() / radii.mean() < 0.3


def test_10k_uid_list():
    with open(osp.join(DATA, "10k.txt")) as f:
        uids = f.read().splitlines()
    assert len(uids) == 10000
    # '<group>/<32-hex objaverse uid>' per line
    for u in uids[:100]:
        group, uid = u.split("/")
        assert len(uid) == 32 and int(uid, 16) >= 0


@pytest.mark.slow
@pytest.mark.skipif(not osp.isdir(REF), reason="reference not mounted")
def test_assets_are_byte_identical_to_reference():
    for name in ("obj_poses.npy", "10k.txt", "test_pairs_pf_same_views.csv",
                 "test_pairs_pf_different_views.csv"):
        with open(osp.join(DATA, name), "rb") as a, \
                open(osp.join(REF, name), "rb") as b:
            assert a.read() == b.read(), name
