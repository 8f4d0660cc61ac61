"""gd3d-preprocess --dataset wildrgbd roundtrip: fabricated RAW WildRGB-D
layout -> preprocessed tree -> WildRGBDViews -> pretrain batch.

The fabricated raw download is geometrically consistent (a fronto-parallel
plane at depth 2 m seen from an x-translating camera, depth stored as raw
mm uint16, K stored column-major as the real dataset does), so the
strongest assertion holds end-to-end: correspondences reprojected with the
PREPROCESSED poses/intrinsics/depths survive — any convention slip
(column-major K, int()-truncated crop bbox, raw-mm re-encode, cam_poses.txt
parsing) would zero them out.
"""
import json

import numpy as np
from PIL import Image

from gd3d.cli.preprocess import main as preprocess_main

CAT = "mug"
SEQ = "scenes/scene_001"
SEQ_VAL = "scenes/scene_002"
H, W = 100, 120
FX = FY = 110.0
CX, CY = 61.3, 48.6
DEPTH_MM = 2000
N_FRAMES = 8


def _write_seq(scene_dir, n_frames, rng):
    for sub in ("rgb", "depth", "masks"):
        (scene_dir / sub).mkdir(parents=True)
    # metadata json: K stored COLUMN-major (preprocess_wildrgbd.py:88)
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
    with open(scene_dir / "metadata", "w") as f:
        json.dump({"K": K.T.flatten().tolist(), "w": W, "h": H}, f)
    rows = []
    for i in range(n_frames):
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            scene_dir / "rgb" / f"{i:05d}.png")
        Image.fromarray(
            np.full((H, W), DEPTH_MM, np.uint16)).save(
            scene_dir / "depth" / f"{i:05d}.png")
        Image.fromarray(np.full((H, W), 255, np.uint8)).save(
            scene_dir / "masks" / f"{i:05d}.png")
        cam2world = np.eye(4)
        cam2world[0, 3] = 0.03 * i  # x-translating camera
        rows.append([i] + cam2world.flatten().tolist())
    np.savetxt(scene_dir / "cam_poses.txt", np.array(rows))


def _make_raw_wildrgbd(root):
    rng = np.random.RandomState(0)
    cat_dir = root / CAT
    _write_seq(cat_dir / SEQ, N_FRAMES, rng)
    _write_seq(cat_dir / SEQ_VAL, N_FRAMES, rng)
    # train = intersection of the two lists' train splits; SEQ_VAL goes to
    # the test split (union minus intersection)
    for lf in ("camera_eval_list.json", "nvs_list.json"):
        with open(cat_dir / lf, "w") as f:
            json.dump({"train": [SEQ], "val": [SEQ_VAL]}, f)


def test_wildrgbd_roundtrip_through_pretrain_loader(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "processed"
    raw.mkdir()
    _make_raw_wildrgbd(raw)

    preprocess_main(["--dataset", "wildrgbd", "--raw-dir", str(raw),
                     "--output-dir", str(out), "--img-size", "64",
                     "--num-frames", str(N_FRAMES)])

    with open(out / "selected_seqs_train.json") as f:
        sel = json.load(f)
    assert set(sel) == {CAT} and set(sel[CAT]) == {SEQ}
    assert sorted(sel[CAT][SEQ]) == list(range(N_FRAMES))
    with open(out / "selected_seqs_test.json") as f:
        sel_test = json.load(f)
    assert set(sel_test[CAT]) == {SEQ_VAL}

    f0 = out / CAT / SEQ
    assert (f0 / "rgb" / "00000.jpg").exists()
    meta = np.load(f0 / "metadata" / "00000.npz")
    assert {"camera_intrinsics", "camera_pose"} <= set(meta.files)
    np.testing.assert_allclose(meta["camera_pose"], np.eye(4), atol=1e-6)
    meta3 = np.load(f0 / "metadata" / "00003.npz")
    np.testing.assert_allclose(meta3["camera_pose"][0, 3], 0.09, atol=1e-6)
    # depth stays RAW mm uint16 (no per-frame max scaling)
    dec = np.asarray(Image.open(f0 / "depth" / "00000.png"))
    assert dec.dtype == np.uint16
    np.testing.assert_array_equal(
        np.unique(dec[dec > 0]), [DEPTH_MM])

    from gd3d.data.stereo_views import WildRGBDViews, views_pretrain_batch

    ds = WildRGBDViews(str(out), split="train", resolution=(48, 48), seed=7)
    assert len(ds) > 0
    v1, v2 = ds[0]
    assert v1["img"].shape == (48, 48, 3)
    assert v1["valid_mask"].any()
    assert v1["is_metric_scale"] is True  # mast3r/datasets/__init__.py:62
    np.testing.assert_allclose(
        v1["depthmap"][v1["valid_mask"]], 2.0, atol=1e-3)

    batch = views_pretrain_batch(ds, [0, 1], np.random.RandomState(0),
                                 n_corres=64)
    assert batch["gt1"]["valid_corres"].any(), (
        "no valid correspondences survived the raw->tree->loader chain")
    assert batch["gt1"]["is_metric_scale"].all()
    assert not batch["gt1"]["sky_mask"].any()


def test_wildrgbd_sequence_subsampling(tmp_path):
    """--num-frames linspace-subsamples each sequence
    (preprocess_wildrgbd.py:108)."""
    raw = tmp_path / "raw"
    out = tmp_path / "processed"
    raw.mkdir()
    _make_raw_wildrgbd(raw)
    preprocess_main(["--dataset", "wildrgbd", "--raw-dir", str(raw),
                     "--output-dir", str(out), "--img-size", "64",
                     "--num-frames", "3"])
    with open(out / "selected_seqs_train.json") as f:
        sel = json.load(f)
    want = np.round(np.linspace(0, N_FRAMES - 1, 3)).astype(int).tolist()
    assert sel[CAT][SEQ] == want
    assert (out / CAT / SEQ / "rgb" / f"{want[1]:05d}.jpg").exists()
    assert not (out / CAT / SEQ / "rgb" / "00001.jpg").exists()
