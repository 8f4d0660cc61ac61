"""gd3d-preprocess roundtrip: fabricated RAW Co3D-v2 layout -> preprocessed
tree -> Co3dViews -> pretrain batch -> one gd3d-pretrain step.

Round-3 verdict item 7. The fabricated raw download is geometrically
consistent (a fronto-parallel plane at depth 2 seen from an x-translating
camera, cameras stored in the pytorch3d-NDC convention the real dataset
uses), so the strongest assertion holds end-to-end: correspondences
reprojected with the PREPROCESSED poses/intrinsics/depths land on pixels
whose stored depth agrees — any convention slip (NDC->pinhole, crop/rescale
intrinsics, uint16 encode/decode, pose inversion) would zero them out.
"""
import gzip
import json

import numpy as np
import pytest
from PIL import Image

from gd3d.cli.preprocess import main as preprocess_main
from gd3d.cli.preprocess import ndc_to_opencv_camera, read_co3d_depth_png

CAT = "toyplane"
SEQ = "106_1_2"
H, W = 100, 120
FX = FY = 110.0
CX, CY = 61.5, 49.0
DEPTH = 2.0
N_FRAMES = 8


def _store_viewpoint(R_cv, t_cv):
    """Invert preprocess_co3d.py:80-113: desired OpenCV (R, t, K) -> the
    pytorch3d-NDC fields the raw frame_annotations store."""
    R_neg = np.asarray(R_cv, np.float64).T  # undo the final transpose
    R_stored = R_neg.copy()
    R_stored[:, :2] *= -1
    T_stored = np.asarray(t_cv, np.float64).copy()
    T_stored[:2] *= -1
    scale = min(W, H) / 2.0
    c0 = np.array([W, H], np.float64) / 2.0
    focal_ndc = np.array([FX, FY]) / scale
    p0_ndc = (c0 - np.array([CX, CY])) / scale
    return (R_stored.tolist(), T_stored.tolist(), focal_ndc.tolist(),
            p0_ndc.tolist())


def _make_raw_co3d(root):
    rng = np.random.RandomState(0)
    cat_dir = root / CAT
    (cat_dir / "set_lists").mkdir(parents=True)
    for sub in ("images", "depths", "masks"):
        (cat_dir / SEQ / sub).mkdir(parents=True)

    frames_ann = []
    set_rows = []
    for i in range(1, N_FRAMES + 1):
        name = f"frame{i:06d}"
        img_rel = f"{CAT}/{SEQ}/images/{name}.jpg"
        depth_rel = f"{CAT}/{SEQ}/depths/{name}.jpg.geometric.png"
        mask_rel = f"{CAT}/{SEQ}/masks/{name}.png"
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            root / img_rel)
        # raw Co3D depth: float16 bits stored in a 16-bit png
        d16 = np.full((H, W), DEPTH, np.float16).view(np.uint16)
        Image.fromarray(d16).save(root / depth_rel)  # mode I;16
        Image.fromarray(np.full((H, W), 255, np.uint8)).save(root / mask_rel)

        # camera i: world2cam translation along x (plane at world z=2)
        t_cv = np.array([-0.03 * i, 0.0, 0.0])
        R_s, T_s, f_ndc, p0_ndc = _store_viewpoint(np.eye(3), t_cv)
        frames_ann.append({
            "sequence_name": SEQ,
            "frame_number": i,
            "image": {"size": [H, W], "path": img_rel},
            "depth": {"path": depth_rel, "scale_adjustment": 1.0},
            "viewpoint": {"R": R_s, "T": T_s, "focal_length": f_ndc,
                          "principal_point": p0_ndc},
        })
        set_rows.append([SEQ, i, img_rel])

    with gzip.open(cat_dir / "frame_annotations.jgz", "wt") as f:
        json.dump(frames_ann, f)
    with gzip.open(cat_dir / "sequence_annotations.jgz", "wt") as f:
        json.dump([{"sequence_name": SEQ, "viewpoint_quality_score": 1.0}],
                  f)
    with open(cat_dir / "set_lists" / "set_lists_fewview_train.json",
              "w") as f:
        json.dump({"train": set_rows, "test": set_rows[:2]}, f)


def test_ndc_conversion_roundtrip():
    R_cv = np.eye(3)
    t_cv = np.array([-0.1, 0.05, 0.2])
    R_s, T_s, f_ndc, p0_ndc = _store_viewpoint(R_cv, t_cv)
    R, t, K = ndc_to_opencv_camera(R_s, T_s, f_ndc, p0_ndc, [H, W])
    np.testing.assert_allclose(R, R_cv, atol=1e-6)
    np.testing.assert_allclose(t, t_cv, atol=1e-6)
    np.testing.assert_allclose(np.diag(K)[:2], [FX, FY], atol=1e-4)
    np.testing.assert_allclose(K[:2, 2], [CX, CY], atol=1e-4)


def test_preprocess_roundtrip_through_pretrain_loader(tmp_path):
    raw = tmp_path / "raw"
    out = tmp_path / "processed"
    raw.mkdir()
    _make_raw_co3d(raw)

    preprocess_main(["--co3d-dir", str(raw), "--output-dir", str(out),
                     "--category", CAT, "--img-size", "64"])

    # tree layout: merged + per-category jsons, images/depths/masks/npz
    with open(out / "selected_seqs_train.json") as f:
        sel = json.load(f)
    assert set(sel) == {CAT} and set(sel[CAT]) == {SEQ}
    assert sorted(sel[CAT][SEQ]) == list(range(1, N_FRAMES + 1))
    f1 = out / CAT / SEQ / "images" / "frame000001.jpg"
    assert f1.exists()
    meta = np.load(out / CAT / SEQ / "images" / "frame000001.npz")
    assert {"camera_intrinsics", "camera_pose", "maximum_depth"} <= set(
        meta.files)
    # constant-depth plane: uint16 encode/decode is exact at the max
    np.testing.assert_allclose(float(meta["maximum_depth"]), DEPTH,
                               rtol=1e-3)
    dec = np.asarray(Image.open(
        out / CAT / SEQ / "depths" / "frame000001.jpg.geometric.png"))
    np.testing.assert_allclose(
        dec.astype(np.float32) / 65535.0 * float(meta["maximum_depth"]),
        DEPTH, rtol=1e-3)
    # pose: cam2world of an x-translating world2cam
    np.testing.assert_allclose(meta["camera_pose"][:3, :3], np.eye(3),
                               atol=1e-5)
    np.testing.assert_allclose(meta["camera_pose"][:3, 3], [0.03, 0, 0],
                               atol=1e-5)

    # the pretrain loader consumes it and the reprojection correspondences
    # are geometrically LIVE
    from gd3d.data.stereo_views import Co3dViews, views_pretrain_batch

    ds = Co3dViews(str(out), split="train", resolution=(48, 48), seed=7)
    assert len(ds) > 0
    v1, v2 = ds[0]
    assert v1["img"].shape == (48, 48, 3)
    assert v1["valid_mask"].any()
    assert v1["is_metric_scale"] is False

    batch = views_pretrain_batch(ds, [0, 1], np.random.RandomState(0),
                                 n_corres=64)
    assert batch["gt1"]["valid_corres"].any(), (
        "no valid correspondences survived the raw->tree->loader chain")
    assert not batch["gt1"]["is_metric_scale"].any()
    assert not batch["gt1"]["sky_mask"].any()


@pytest.mark.slow
def test_preprocess_feeds_gd3d_pretrain(tmp_path):
    """Full CLI chain: gd3d-preprocess -> gd3d-pretrain --co3d-root."""
    raw = tmp_path / "raw"
    out = tmp_path / "processed"
    raw.mkdir()
    _make_raw_co3d(raw)
    preprocess_main(["--co3d-dir", str(raw), "--output-dir", str(out),
                     "--category", CAT, "--img-size", "64"])

    from gd3d.cli.pretrain import main as pretrain_main

    run = tmp_path / "run"
    pretrain_main(["--output", str(run), "--co3d-root", str(out),
                   "--tiny", "--steps", "1", "--corres", "32", "--cpu"])
    with open(run / "metrics.jsonl") as f:
        rec = json.loads(f.readline())
    assert np.isfinite(rec["loss"])


def test_read_co3d_depth_png_roundtrip(tmp_path):
    arr = np.abs(np.random.RandomState(3).randn(11, 13)).astype(np.float16)
    Image.fromarray(arr.view(np.uint16)).save(tmp_path / "d.png")
    got = read_co3d_depth_png(str(tmp_path / "d.png"))
    np.testing.assert_array_equal(got, arr.astype(np.float32))
