"""FiT3D baseline-comparison harness (gd3d/eval/fit3d.py).

Round-3 verdict item 3: exercise `compare()` end-to-end on fabricated
fixtures for ALL three evaluations and cover `load_fit3d_student`'s
checkpoint graft path. The reference harness is
src/evaluate_timm_fit3d.py:628-691 — it runs each selected evaluation for
the FiT3D-finetuned model AND the vanilla backbone, producing one metric
table per (eval, model) pair.
"""
import json
import pickle

import jax
import numpy as np
import pandas as pd
import pytest
import torch
from PIL import Image

from gd3d.core.config import StudentConfig
from gd3d.eval.fit3d import compare, load_fit3d_student

SMALL = StudentConfig(
    embed_dim=32, depth=2, num_heads=2, patch_size=16,
    pretrain_img_size=32, lora_start_block=99, use_adapters=False,
    target_res=64, depth_head_hidden=16,
)


def _timm_state(cfg: StudentConfig, seed=0):
    """A tiny torch state_dict in the timm VisionTransformer key layout
    convert_timm_vit consumes (CLIP variant: norm_pre, bias-free patch
    embed)."""
    g = torch.Generator().manual_seed(seed)
    d, hid, ps = cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio), cfg.patch_size
    n_tok = (cfg.pretrain_img_size // ps) ** 2 + 1

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.02

    st = {
        "cls_token": r(1, 1, d),
        "pos_embed": r(1, n_tok, d),
        "patch_embed.proj.weight": r(d, 3, ps, ps),
        "norm_pre.weight": torch.ones(d), "norm_pre.bias": r(d),
        "norm.weight": torch.ones(d), "norm.bias": r(d),
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        st.update({
            f"{p}.norm1.weight": torch.ones(d), f"{p}.norm1.bias": r(d),
            f"{p}.norm2.weight": torch.ones(d), f"{p}.norm2.bias": r(d),
            f"{p}.attn.qkv.weight": r(3 * d, d),
            f"{p}.attn.qkv.bias": r(3 * d),
            f"{p}.attn.proj.weight": r(d, d), f"{p}.attn.proj.bias": r(d),
            f"{p}.mlp.fc1.weight": r(hid, d), f"{p}.mlp.fc1.bias": r(hid),
            f"{p}.mlp.fc2.weight": r(d, hid), f"{p}.mlp.fc2.bias": r(d),
        })
    return st


def _pascal_fixture(data_root):
    root = data_root / "PF-dataset-PASCAL"
    root.mkdir(parents=True)
    (data_root / "JPEGImages").mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(2):
        n = f"JPEGImages/im{i}.jpg"
        Image.fromarray(rng.randint(0, 255, (80, 100, 3), np.uint8)).save(
            root / ".." / n)
        names.append(n)

    def coords(xs, ys):
        return (";".join(f"{v:.1f}" for v in xs),
                ";".join(f"{v:.1f}" for v in ys))

    xa, ya = coords([20, 50, 70], [30, 40, 60])
    xb, yb = coords([25, 55, 65], [35, 45, 55])
    rows = [[names[0], names[1], 8, xa, ya, xb, yb]] * 2  # 'cat' twice
    df = pd.DataFrame(rows)
    df.to_csv(root / "test_pairs_pf_different_views.csv", index=False)
    df.to_csv(root / "test_pairs_pf_same_views.csv", index=False)


def _tracking_fixture(data_root):
    rng = np.random.RandomState(0)
    T, H, W = 3, 96, 128
    vdir = data_root / "davis_480" / "0" / "video"
    vdir.mkdir(parents=True)
    for t in range(T):
        Image.fromarray(rng.randint(0, 255, (H, W, 3), np.uint8)).save(
            vdir / f"{t:05d}.jpg")
    N = 2
    bench = {
        "videos": [{
            "video_idx": 0, "h": H, "w": W,
            "query_points": {0: [[30.0, 40.0], [60.0, 50.0]]},
            "target_points": {0: np.full((N, T, 2), 40.0)},
            "occluded": {0: np.zeros((N, T), bool)},
        }]
    }
    with open(data_root / "tapvid_davis_data_strided.pkl", "wb") as f:
        pickle.dump(bench, f)


def _onepose_fixture(data_root):
    import cv2

    rng = np.random.RandomState(1)
    root = data_root / "lowtexture_test_data"
    sfm = data_root / "sfm_output" / "outputs_softmax_loftr_loftr"
    obj = "0700-toy"
    H, W = 64, 80
    (root / obj / "toy-1" / "anno_loftr").mkdir(parents=True)
    (root / obj / "toy-1" / "color").mkdir(parents=True)
    (sfm / obj / "anno").mkdir(parents=True)
    np.savez(sfm / obj / "anno" / "anno_3d_average.npz",
             keypoints3d=rng.rand(20, 3) * 0.1)
    for idx in ("0", "1"):
        kp2d = rng.rand(8, 2) * [W - 8, H - 8] + 4
        anno = {"keypoints2d": kp2d.tolist(),
                "assign_matrix": [list(range(8)), list(range(8))]}
        with open(root / obj / "toy-1" / "anno_loftr" / f"{idx}.json",
                  "w") as f:
            json.dump(anno, f)
        cv2.imwrite(str(root / obj / "toy-1" / "color" / f"{idx}.png"),
                    rng.randint(0, 255, (H, W, 3), np.uint8))
    for sub in ("color", "intrin_ba", "poses_ba"):
        (root / obj / "toy-2" / sub).mkdir(parents=True)
    cv2.imwrite(str(root / obj / "toy-2" / "color" / "0.png"),
                rng.randint(0, 255, (H, W, 3), np.uint8))
    np.savetxt(root / obj / "toy-2" / "intrin_ba" / "0.txt",
               np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]]))
    np.savetxt(root / obj / "toy-2" / "poses_ba" / "0.txt", np.eye(4))


def test_load_fit3d_student_grafts_checkpoint(tmp_path):
    """The local-.pth path must actually land the converted weights in the
    student tree (vs the fresh random init)."""
    st = _timm_state(SMALL)
    ckpt = tmp_path / "fit3d.pth"
    torch.save(st, ckpt)

    _, fresh = load_fit3d_student(None, cfg=SMALL)
    student, params = load_fit3d_student(str(ckpt), cfg=SMALL)

    want_kernel = st["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        np.asarray(params["vit"]["patch_embed"]["kernel"]), want_kernel)
    assert not np.allclose(
        np.asarray(fresh["vit"]["patch_embed"]["kernel"]), want_kernel)
    # the grafted model still runs
    feat = student.get_feature_cost(
        params, jax.numpy.zeros((1, 64, 64, 3)), normalize=True)
    assert np.all(np.isfinite(np.asarray(feat)))


def test_compare_transfer_layout(tmp_path):
    """compare() with the PCK eval: table keys '{eval}/{model}' for both
    models, PCK columns at the reference thresholds."""
    data_root = tmp_path / "data"
    _pascal_fixture(data_root)
    ckpt = tmp_path / "fit3d.pth"
    torch.save(_timm_state(SMALL), ckpt)

    results = compare(
        str(ckpt), None, data_root=str(data_root), cfg=SMALL,
        transfer_kwargs={"img_size": 64, "categories": ["cat"]},
    )
    assert set(results) == {"transfer/fit3d", "transfer/vanilla"}
    for df in results.values():
        assert {"PCK0.05", "PCK0.10", "PCK0.15"}.issubset(df.columns)
        assert len(df) == 1
        for col in ("PCK0.05", "PCK0.10", "PCK0.15"):
            assert 0.0 <= float(df[col].iloc[0]) <= 1.0
    # ckpt-not-ignored is proven by
    # test_load_fit3d_student_grafts_checkpoint (param-level); PCK values
    # can coincide at tiny geometry, so no value-inequality assert here


@pytest.mark.slow
def test_compare_all_three_evals(tmp_path):
    """compare() drives tracking and pose too — six tables, one per
    (eval, model), mirroring evaluate_timm_fit3d's CSV family."""
    data_root = tmp_path / "data"
    _pascal_fixture(data_root)
    _tracking_fixture(data_root)
    _onepose_fixture(data_root)
    ckpt = tmp_path / "fit3d.pth"
    torch.save(_timm_state(SMALL), ckpt)

    results = compare(
        str(ckpt), None, data_root=str(data_root), cfg=SMALL,
        run_transfer=True, run_tracking=True, run_pose=True, num_videos=1,
        transfer_kwargs={"img_size": 64, "categories": ["cat"]},
    )
    assert set(results) == {
        f"{e}/{m}" for e in ("transfer", "tracking", "pose")
        for m in ("fit3d", "vanilla")
    }
    assert "average_jaccard" in results["tracking/fit3d"].columns
    assert set(results["pose/fit3d"].columns) == {
        "threshold_1", "threshold_3", "threshold_5"}
    for df in results.values():
        assert np.all(np.isfinite(df.to_numpy(dtype=np.float64)))


def test_load_fit3d_student_url_path(monkeypatch):
    """An http(s) ckpt must route through torch.hub.load_state_dict_from_url
    (the reference's download path, evaluate_timm_fit3d.py:673) and graft
    identically to the local-.pth path. Network is mocked — this asserts
    the code path, not connectivity."""
    st = _timm_state(SMALL)
    calls = {}

    def fake_load(url, map_location=None):
        calls["url"] = url
        calls["map_location"] = map_location
        return st

    monkeypatch.setattr(torch.hub, "load_state_dict_from_url", fake_load)
    _, params = load_fit3d_student(
        "https://example.com/clip_base_finetuned.pth", cfg=SMALL)
    assert calls["url"].startswith("https://")
    assert calls["map_location"] == "cpu"
    want_kernel = st["patch_embed.proj.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(
        np.asarray(params["vit"]["patch_embed"]["kernel"]), want_kernel)


def test_fit3d_default_ckpt_is_the_reference_url():
    from gd3d.eval.fit3d import FIT3D_CKPT_URL

    assert FIT3D_CKPT_URL.startswith("https://huggingface.co/yuanwenyue")
