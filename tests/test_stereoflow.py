"""CroCo-Stereo / CroCo-Flow suite: codecs, model, tiled inference, training.

Fast tier: flow/disparity file-format roundtrips, pair discovery over the
reference dataset layouts, tiny-model forward/train smoke, tiled_pred
reconstruction properties.

Slow tier (reference-DIRECT): gd3d.stereoflow losses/metrics/tiled_pred vs
the ACTUAL vendored modules `dust3r/croco/stereoflow/criterion.py` and
`dust3r/croco/stereoflow/engine.py` driven on identical tensors.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/dust3r/croco/stereoflow"


# ---------------------------------------------------------------------------
# file formats (gd3d/data/flowio.py)
# ---------------------------------------------------------------------------


def test_flo_roundtrip(tmp_path):
    from gd3d.data.flowio import read_flo, write_flo

    flow = np.random.RandomState(0).randn(7, 9, 2).astype(np.float32)
    p = str(tmp_path / "a.flo")
    write_flo(p, flow)
    np.testing.assert_array_equal(read_flo(p), flow)


def test_kitti_flow_roundtrip(tmp_path):
    from gd3d.data.flowio import read_kitti_flow, write_kitti_flow

    rng = np.random.RandomState(1)
    flow = (rng.randn(6, 8, 2) * 10).astype(np.float32)
    p = str(tmp_path / "f.png")
    write_kitti_flow(p, flow)
    back = read_kitti_flow(p)
    # codec quantizes at 1/64 px
    np.testing.assert_allclose(back, flow, atol=1.0 / 64 + 1e-6)


def test_kitti_disp_roundtrip_and_invalids(tmp_path):
    from gd3d.data.flowio import read_kitti_disp, write_kitti_disp

    disp = np.array([[1.5, 0.25], [np.inf, 100.0]], np.float32)
    p = str(tmp_path / "d.png")
    write_kitti_disp(p, disp)
    back = read_kitti_disp(p)
    # 0-valued pixels decode to +inf (datasets_stereo.py:551-556)
    assert np.isinf(back[1, 0])
    np.testing.assert_allclose(back[0], disp[0], atol=1.0 / 256)


def test_pfm_roundtrip(tmp_path):
    from gd3d.data.flowio import read_pfm, write_pfm

    img = np.random.RandomState(2).rand(5, 4).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    back, scale = read_pfm(p)
    np.testing.assert_allclose(back, img, rtol=1e-6)
    assert scale == 1.0

    # flow convention: 3-channel with a zero third band (datasets_flow.py)
    from gd3d.data.flowio import read_pfm_flow

    flow = np.random.RandomState(3).randn(5, 4, 2).astype(np.float32)
    p3 = str(tmp_path / "f.pfm")
    write_pfm(p3, np.concatenate([flow, np.zeros_like(flow[..., :1])], -1))
    np.testing.assert_allclose(read_pfm_flow(p3), flow, rtol=1e-6)


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


def _make_generic_tree(root, task, n=2, hw=(160, 224)):
    rng = np.random.RandomState(3)
    for d in ("left", "right", "gt"):
        (root / d).mkdir(parents=True, exist_ok=True)
    for i in range(n):
        h, w = hw
        _write_png(root / "left" / f"p{i}.png",
                   rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        _write_png(root / "right" / f"p{i}.png",
                   rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        if task == "stereo":
            gt = rng.rand(h, w).astype(np.float32) * 20 + 1
        else:
            gt = rng.randn(h, w, 2).astype(np.float32) * 5
        np.save(root / "gt" / f"p{i}.npy", gt)


def test_discover_pairs_generic(tmp_path):
    from gd3d.data.flowio import StereoFlowPairs, discover_pairs

    _make_generic_tree(tmp_path, "stereo", n=3)
    pairs = discover_pairs(str(tmp_path), "generic", "stereo")
    assert len(pairs) == 3 and all(g is not None for _, _, g in pairs)
    ds = StereoFlowPairs(pairs, "stereo")
    item = ds[0]
    assert item["img1"].shape == (160, 224, 3)
    assert item["gt"].shape == (160, 224, 1)
    # ImageNet normalization applied (mean roughly centered)
    assert abs(float(item["img1"].mean())) < 3.0


def test_discover_pairs_kitti15(tmp_path):
    from gd3d.data.flowio import discover_pairs

    d = tmp_path / "training"
    for sub in ("image_2", "image_3", "disp_occ_0", "flow_occ"):
        (d / sub).mkdir(parents=True)
    img = np.zeros((8, 8, 3), np.uint8)
    for stem in ("000000_10", "000000_11"):
        _write_png(d / "image_2" / f"{stem}.png", img)
    _write_png(d / "image_3" / "000000_10.png", img)
    _write_png(d / "disp_occ_0" / "000000_10.png",
               np.zeros((8, 8), np.uint16))
    stereo = discover_pairs(str(tmp_path), "kitti15", "stereo")
    flow = discover_pairs(str(tmp_path), "kitti15", "flow")
    assert len(stereo) == 1 and stereo[0][2].endswith("disp_occ_0/000000_10.png")
    assert len(flow) == 1 and flow[0][1].endswith("000000_11.png")


def test_discover_pairs_kitti15_stereo_requires_right_image(tmp_path):
    """A frame with no image_3 sibling must be skipped, not returned as a
    pair pointing at a nonexistent file."""
    from gd3d.data.flowio import discover_pairs

    d = tmp_path / "training"
    for sub in ("image_2", "image_3", "disp_occ_0"):
        (d / sub).mkdir(parents=True)
    img = np.zeros((8, 8, 3), np.uint8)
    _write_png(d / "image_2" / "000000_10.png", img)
    _write_png(d / "image_2" / "000001_10.png", img)
    _write_png(d / "image_3" / "000000_10.png", img)  # only frame 0 has R
    pairs = discover_pairs(str(tmp_path), "kitti15", "stereo")
    assert len(pairs) == 1 and pairs[0][0].endswith("000000_10.png")


def test_discover_pairs_sintel_both_passes(tmp_path):
    """The sintel layout covers BOTH render passes (clean + final), like
    the reference's SintelDataset subsets."""
    from gd3d.data.flowio import discover_pairs, write_flo

    img = np.zeros((8, 8, 3), np.uint8)
    for render in ("clean", "final"):
        seq = tmp_path / "training" / render / "alley_1"
        seq.mkdir(parents=True)
        _write_png(seq / "frame_0001.png", img)
        _write_png(seq / "frame_0002.png", img)
    fl = tmp_path / "training" / "flow" / "alley_1"
    fl.mkdir(parents=True)
    write_flo(str(fl / "frame_0001.flo"), np.zeros((8, 8, 2), np.float32))
    pairs = discover_pairs(str(tmp_path), "sintel", "flow")
    assert len(pairs) == 2
    renders = {p[0].split(os.sep)[-3] for p in pairs}
    assert renders == {"clean", "final"}
    assert all(g is not None for _, _, g in pairs)


def test_pair_names_unique_across_scenes(tmp_path):
    """eth3d/middlebury scenes all name their left image im0.png; with
    root given, item names are scene-qualified so eval outputs don't
    collide."""
    from gd3d.data.flowio import StereoFlowPairs, discover_pairs, write_pfm

    img = np.zeros((8, 8, 3), np.uint8)
    for scene in ("sceneA", "sceneB"):
        d = tmp_path / scene
        d.mkdir()
        _write_png(d / "im0.png", img)
        _write_png(d / "im1.png", img)
        write_pfm(str(d / "disp0.pfm"), np.ones((8, 8), np.float32))
    pairs = discover_pairs(str(tmp_path), "middlebury", "stereo")
    ds = StereoFlowPairs(pairs, "stereo", root=str(tmp_path))
    names = {ds[i]["name"] for i in range(len(ds))}
    assert names == {"sceneA_im0", "sceneB_im0"}


def test_no_conf_rejects_explicit_conf_criterion():
    from gd3d.cli.stereoflow import main

    with pytest.raises(SystemExit):
        main(["train", "--task", "stereo", "--tiny", "--no-conf",
              "--criterion", "LaplacianLossBounded2()",
              "--root", "/nonexistent", "--output", "/tmp/x"])


def test_augmentors_shapes():
    from gd3d.data.flowio import FlowAugmentor, StereoAugmentor

    rng = np.random.RandomState(4)
    img1 = rng.randint(0, 255, (120, 180, 3), dtype=np.uint8)
    img2 = rng.randint(0, 255, (120, 180, 3), dtype=np.uint8)
    disp = rng.rand(120, 180).astype(np.float32) * 10
    a = StereoAugmentor((64, 96), rng=np.random.RandomState(5))
    o1, o2, od = a(img1, img2, disp)
    assert o1.shape == (64, 96, 3) and od.shape == (64, 96)

    flow = rng.randn(120, 180, 2).astype(np.float32) * 4
    f = FlowAugmentor((64, 96), rng=np.random.RandomState(6))
    o1, o2, of = f(img1, img2, flow)
    assert o1.shape == (64, 96, 3) and of.shape == (64, 96, 2)
    # sparse path: some invalids survive as inf, never NaN
    flow[::3, ::2] = np.inf
    o1, o2, of = f(img1, img2, flow)
    assert not np.isnan(of).any()


# ---------------------------------------------------------------------------
# model + training smoke (tiny config)
# ---------------------------------------------------------------------------


def _tiny_cfg(task="stereo", with_conf=True):
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.stereoflow import StereoFlowConfig

    croco = CrocoConfig(patch_size=16, enc_embed_dim=32, enc_depth=2,
                        enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                        dec_num_heads=2)
    return StereoFlowConfig(croco=croco, task=task, with_conf=with_conf,
                            hooks=(0, 1, 2, 3), dpt_layer_dims=(8, 16, 24, 32),
                            dpt_feature_dim=16, dpt_last_dim=8)


def test_stereoflow_forward_shapes():
    import jax
    import jax.numpy as jnp

    from gd3d.models.stereoflow import StereoFlow

    for task, C in (("stereo", 1), ("flow", 2)):
        cfg = _tiny_cfg(task)
        model = StereoFlow(cfg)
        x = jnp.zeros((2, 32, 48, 3), jnp.float32)
        params = model.init(jax.random.key(0), x, x)["params"]
        pred, conf = model.apply({"params": params}, x, x)
        assert pred.shape == (2, 32, 48, C)
        assert conf.shape == (2, 32, 48)

    cfg = _tiny_cfg("stereo", with_conf=False)
    model = StereoFlow(cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, x)["params"]
    pred, conf = model.apply({"params": params}, x, x)
    assert pred.shape == (1, 32, 32, 1) and conf is None


def test_hook_formula_matches_reference():
    """head_downstream.py:40-46: hooks over [enc..., dec...] with
    step {8:3, 12:4, 24:8}[dec_depth]."""
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.stereoflow import StereoFlowConfig

    # released CroCo v2 ViT-L enc (24) + Base dec (12): step 4
    cfg = StereoFlowConfig(croco=CrocoConfig(enc_depth=24, dec_depth=12))
    # hooks = [dec+enc-1-i*step for i in 3..0] = [36-1-12, -8, -4, -0]
    assert cfg.resolved_hooks == (23, 27, 31, 35)


def test_train_step_and_tiled_eval(tmp_path):
    """gd3d-stereoflow train + eval + predict end-to-end on the tiny model."""
    from gd3d.cli.stereoflow import main

    root = tmp_path / "data"
    _make_generic_tree(root, "stereo", n=2)
    out = tmp_path / "run"
    main(["train", "--task", "stereo", "--tiny", "--root", str(root),
          "--output", str(out), "--steps", "2", "--batch", "1",
          "--warmup", "1"])
    assert (out / "params_final.npz").exists()
    log = (out / "train_log.jsonl").read_text().strip().splitlines()
    assert len(log) == 2

    ev = tmp_path / "eval"
    main(["eval", "--task", "stereo", "--tiny", "--root", str(root),
          "--ckpt", str(out / "params_final.npz"), "--output", str(ev),
          "--tile-overlap", "0.3", "--save", "metrics", "pred"])
    import json

    res = json.loads((ev / "metrics.json").read_text())
    assert set(res) >= {"L1err", "bad@1.0"}
    assert np.isfinite(res["L1err"])

    pred = tmp_path / "out.npy"
    main(["predict", "--task", "stereo", "--tiny",
          "--ckpt", str(out / "params_final.npz"),
          "--left", str(root / "left" / "p0.png"),
          "--right", str(root / "right" / "p0.png"),
          "--output", str(pred), "--tile-overlap", "0.3",
          "--visu", str(tmp_path / "v.png")])
    arr = np.load(pred)
    assert arr.shape == (160, 224, 1) and np.isfinite(arr).all()
    assert (tmp_path / "v.png").exists()


def test_tiled_pred_constant_model():
    """A model that predicts a constant must reconstruct that constant
    everywhere after weighted tile aggregation (any conf mode)."""
    import jax.numpy as jnp

    from gd3d.stereoflow import tiled_pred

    def apply_fn(t1, t2):
        pred = jnp.full(t1.shape[:3] + (2,), 3.25, jnp.float32)
        conf = jnp.cumsum(jnp.ones(t1.shape[:3]), axis=-1) * 0.1
        return pred, conf

    img = jnp.zeros((1, 70, 100, 3), jnp.float32)
    pred, loss, c = tiled_pred(apply_fn, img, img, crop=(32, 48), overlap=0.5,
                               conf_mode="conf_expsigmoid_10_5")
    assert pred.shape == (1, 70, 100, 2)
    np.testing.assert_allclose(np.asarray(pred), 3.25, rtol=1e-5)
    assert np.isnan(float(loss))  # no gt -> nan loss like the reference


# ---------------------------------------------------------------------------
# reference-DIRECT parity (slow tier)
# ---------------------------------------------------------------------------


def _load_ref(name, fname):
    torch = pytest.importorskip("torch")  # noqa: F841
    if name in sys.modules:
        return sys.modules[name]
    # engine.py: `import torchvision` + `from utils import misc` at module
    # level; neither symbol is used by tiled_pred/_overlapping.
    for stub in ("torchvision", "utils", "utils.misc"):
        if stub not in sys.modules:
            m = types.ModuleType(stub)
            sys.modules[stub] = m
    sys.modules["utils"].misc = sys.modules["utils.misc"]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{fname}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _rand_pred_gt(task, rng, B=2, H=12, W=10, inval=0.3):
    C = {"stereo": 1, "flow": 2}[task]
    pred = rng.randn(B, H, W, C).astype(np.float32)
    gt = (rng.randn(B, H, W, C) * 3).astype(np.float32)
    bad = rng.rand(B, H, W) < inval
    gt[bad] = np.inf
    conf = rng.randn(B, H, W).astype(np.float32)
    return pred, gt, conf


def _nchw(t, x):
    return t.tensor(np.moveaxis(x, -1, 1))


@pytest.mark.slow
@pytest.mark.parametrize("task", ["stereo", "flow"])
def test_reference_direct_criteria(task):
    import torch

    crit = _load_ref("ref_sf_criterion", "criterion.py")
    from gd3d import stereoflow as sf

    rng = np.random.RandomState(7)
    pred, gt, conf = _rand_pred_gt(task, rng)
    tp, tg = _nchw(torch, pred), _nchw(torch, gt)
    tc = torch.tensor(conf)[:, None]

    cases = [
        (sf.l1_loss(pred, gt), crit.L1Loss()(tp, tg)),
        (sf.l1_loss(pred, gt, max_gtnorm=2.0),
         crit.L1Loss(max_gtnorm=2.0)(tp, tg)),
        (sf.laplacian_loss(pred, gt, conf), crit.LaplacianLoss()(tp, tg, tc)),
        (sf.laplacian_loss_bounded(pred, gt, conf),
         crit.LaplacianLossBounded()(tp, tg, tc)),
        (sf.laplacian_loss_bounded2(pred, gt, conf),
         crit.LaplacianLossBounded2()(tp, tg, tc)),
    ]
    for ours, ref in cases:
        np.testing.assert_allclose(float(ours), float(ref), rtol=2e-5)

    ours = (sf.stereo_metrics if task == "stereo" else sf.flow_metrics)(
        pred, gt)
    ref = (crit.StereoMetrics() if task == "stereo"
           else crit.FlowMetrics())(tp, tg)
    assert set(ours) == set(ref)
    for k in ref:
        np.testing.assert_allclose(float(ours[k]), float(ref[k]), rtol=2e-5,
                                   err_msg=k)


@pytest.mark.slow
@pytest.mark.parametrize("task,spring", [("stereo", False), ("flow", False),
                                         ("stereo", True), ("flow", True)])
def test_reference_direct_dataset_metrics(task, spring):
    import torch

    crit = _load_ref("ref_sf_criterion", "criterion.py")
    from gd3d import stereoflow as sf

    ours = (sf.StereoDatasetMetrics if task == "stereo"
            else sf.FlowDatasetMetrics)()
    ref = (crit.StereoDatasetMetrics() if task == "stereo"
           else crit.FlowDatasetMetrics())
    ref.reset()
    rng = np.random.RandomState(8)
    for _ in range(3):
        pred, gt, _ = _rand_pred_gt(task, rng)
        if spring:  # gt at 2x the prediction resolution
            B, H, W, C = pred.shape
            gt = (rng.randn(B, 2 * H, 2 * W, C) * 3).astype(np.float32)
            gt[rng.rand(B, 2 * H, 2 * W) < 0.3] = np.inf
        ours.add_batch(pred, gt)
        ref.add_batch(_nchw(torch, pred), _nchw(torch, gt))
    r_ours, r_ref = ours.get_results(), ref.get_results()
    assert set(r_ours) == set(r_ref)
    for k in r_ref:
        np.testing.assert_allclose(r_ours[k], r_ref[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


class _TorchToyModel:
    """Deterministic binocular 'model' for tiled_pred parity: smooth
    functions of both crops, C task channels + 1 confidence channel."""

    def __init__(self, task):
        self.C = {"stereo": 1, "flow": 2}[task]

    def __call__(self, t1, t2):
        import torch

        chans = [t1.mean(dim=1) - 0.5 * t2.mean(dim=1)]
        if self.C == 2:
            chans.append(2.0 * t1[:, 0] + t2[:, 1])
        conf = torch.sin(3.0 * t1[:, 2]) - t2[:, 0]
        return torch.stack(chans + [conf], dim=1)


def _jax_toy_apply(task):
    import jax.numpy as jnp

    C = {"stereo": 1, "flow": 2}[task]

    def apply_fn(t1, t2):
        chans = [t1.mean(axis=-1) - 0.5 * t2.mean(axis=-1)]
        if C == 2:
            chans.append(2.0 * t1[..., 0] + t2[..., 1])
        conf = jnp.sin(3.0 * t1[..., 2]) - t2[..., 0]
        return jnp.stack(chans, axis=-1), conf

    return apply_fn


@pytest.mark.slow
@pytest.mark.parametrize(
    "task,hw,conf_mode",
    [("stereo", (70, 100), "conf_expsigmoid_15_3"),
     ("flow", (70, 100), "conf_expsigmoid_10_5"),
     ("flow", (64, 96), "conf_expbeta3.0"),
     # upscale path: H, W smaller than the crop (engine.py:194-204)
     ("stereo", (20, 30), "conf_expsigmoid_15_3")])
def test_reference_direct_tiled_pred(task, hw, conf_mode):
    import torch

    engine = _load_ref("ref_sf_engine", "engine.py")
    crit = _load_ref("ref_sf_criterion", "criterion.py")
    from gd3d import stereoflow as sf

    H, W = hw
    rng = np.random.RandomState(9)
    img1 = rng.rand(1, H, W, 3).astype(np.float32)
    img2 = rng.rand(1, H, W, 3).astype(np.float32)
    C = {"stereo": 1, "flow": 2}[task]
    gt = (rng.randn(1, H, W, C) * 2).astype(np.float32)
    upscaled = H < 32 or W < 48
    if not upscaled:
        # inf-invalids only on the non-resized path (bicubic on inf -> nan
        # in the reference too)
        gt[rng.rand(1, H, W) < 0.2] = np.inf

    ref_crit = (crit.LaplacianLossBounded2() if task == "stereo"
                else crit.LaplacianLossBounded())
    with torch.no_grad():
        ref_pred, ref_loss, ref_c = engine.tiled_pred(
            _TorchToyModel(task), ref_crit, _nchw(torch, img1),
            _nchw(torch, img2), _nchw(torch, gt), overlap=0.5,
            crop=(32, 48), conf_mode=conf_mode, with_conf=True)

    name = ("LaplacianLossBounded2()" if task == "stereo"
            else "LaplacianLossBounded()")
    pred, loss, c = sf.tiled_pred(
        _jax_toy_apply(task), img1, img2, gt, crop=(32, 48), overlap=0.5,
        conf_mode=conf_mode, criterion=sf.CRITERIA[name])

    tol = dict(rtol=2e-4, atol=(5e-4 if upscaled else 1e-5))
    np.testing.assert_allclose(
        np.asarray(pred), np.moveaxis(ref_pred.numpy(), 1, -1), **tol)
    np.testing.assert_allclose(np.asarray(c), ref_c.numpy(), rtol=2e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-4)


@pytest.mark.slow
def test_overlapping_starts_reference_direct():
    engine = _load_ref("ref_sf_engine", "engine.py")
    from gd3d.stereoflow import overlapping_starts

    for total, window, ov in [(100, 32, 0.5), (70, 70, 0.5), (701, 352, 0.7),
                              (1024, 704, 0.9)]:
        ref = [s.start for s in engine._overlapping(total, window, ov)]
        np.testing.assert_array_equal(
            overlapping_starts(total, window, ov), ref)


@pytest.mark.slow
@pytest.mark.parametrize("task", ["stereo", "flow"])
def test_reference_direct_stereoflow_model(task):
    """The ACTUAL CroCoDownstreamBinocular + PixelwiseTaskWithDPT from
    /root/reference (tiny dims, random weights) vs gd3d's StereoFlow with
    convert_stereoflow-converted weights.

    The reference's own forward is dead code in-tree (its `_decoder`
    2-tuple unpack predates the fork's 3-tuple DecoderBlock return,
    croco.py:206 vs blocks.py:189-195), so the decoder loop is driven
    manually with the fork-compatible unpack — exactly the semantics
    croco_downstream.py:116-122 composes (enc all-blocks + dec all-blocks,
    last entries normed, head over the concatenated hook list)."""
    import torch

    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    for p in ("/root/reference/dust3r", "/root/reference/dust3r/croco"):
        if p not in sys.path:
            sys.path.append(p)
    from models.croco_downstream import CroCoDownstreamBinocular
    from models.head_downstream import PixelwiseTaskWithDPT

    from gd3d.models.croco import CrocoConfig
    from gd3d.models.stereoflow import (StereoFlow, StereoFlowConfig,
                                        convert_stereoflow)

    C = {"stereo": 1, "flow": 2}[task]
    torch.manual_seed(3)
    # test.py:59-66: head num_channels = task channels + 1 (with_conf);
    # hooks explicit because the auto formula needs dec_depth in {8,12,24}
    head = PixelwiseTaskWithDPT(hooks_idx=[0, 1, 2, 3],
                                layer_dims=[8, 16, 24, 32],
                                num_channels=C + 1)
    ref = CroCoDownstreamBinocular(
        head, img_size=64, patch_size=16, enc_embed_dim=32, enc_depth=2,
        enc_num_heads=2, dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
        pos_embed="RoPE100").eval()

    rng = np.random.RandomState(11)
    H = W = 64
    img1 = rng.randn(2, 3, H, W).astype(np.float32)
    img2 = rng.randn(2, 3, H, W).astype(np.float32)
    with torch.no_grad():
        t1, t2 = torch.from_numpy(img1), torch.from_numpy(img2)
        # encode_image_pairs (croco_downstream.py:94-107): one 2B batch,
        # all blocks, last entry enc_norm'd inside _encode_image
        out, pos, _ = ref._encode_image(torch.cat((t1, t2), dim=0),
                                        do_mask=False, return_all_blocks=True)
        out, out2 = map(list, zip(*[o.chunk(2, dim=0) for o in out]))
        pos1, pos2 = pos.chunk(2, dim=0)
        # _decoder (croco.py:173-208) with the fork's 3-tuple unpack
        x = ref.decoder_embed(out[-1])
        y = ref.decoder_embed(out2[-1])
        dec = []
        for blk in ref.dec_blocks:
            x, y, _ = blk(x, y, pos1, pos2)
            dec.append(x)
        dec[-1] = ref.dec_norm(dec[-1])
        ref_out = ref.head(out + dec, {"height": H, "width": W}).numpy()

    cfg = StereoFlowConfig(
        croco=CrocoConfig(patch_size=16, enc_embed_dim=32, enc_depth=2,
                          enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                          dec_num_heads=2),
        task=task, with_conf=True, hooks=(0, 1, 2, 3),
        dpt_layer_dims=(8, 16, 24, 32))
    params = convert_stereoflow(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    model = StereoFlow(cfg)
    j1 = np.moveaxis(img1, 1, -1)
    j2 = np.moveaxis(img2, 1, -1)
    pred, conf = model.apply({"params": params}, j1, j2)

    np.testing.assert_allclose(np.asarray(pred),
                               np.moveaxis(ref_out[:, :C], 1, -1),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(conf), ref_out[:, C],
                               rtol=1e-4, atol=2e-4)


def test_bicubic_matches_torch():
    """resize_bicubic_torch vs torch F.interpolate (engine.py:163-164)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from gd3d.stereoflow import resize_bicubic_torch

    rng = np.random.RandomState(10)
    x = rng.rand(2, 11, 17, 3).astype(np.float32)
    for out_hw in [(22, 34), (33, 51), (7, 40)]:
        ref = F.interpolate(_nchw(torch, x), size=out_hw, mode="bicubic",
                            align_corners=False).numpy()
        ours = np.moveaxis(np.asarray(resize_bicubic_torch(
            np.asarray(x), out_hw)), -1, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
