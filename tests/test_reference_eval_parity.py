"""Reference-DIRECT parity for the eval harnesses (round-3 verdict item 4).

(a) PCK: the ACTUAL reference pipeline — src/evaluate_timm.py's
    load_pascal_data + resize + semantic_transfer, driven end-to-end with
    the REAL vendored pair CSVs (/root/reference/data/test_pairs_pf_*.csv)
    on fabricated images — vs gd3d's semantic_transfer with the same tiny
    student. Locks the canvas resize, the keypoint pad/rescale, the
    14/14-default kp-descriptor sampling quirk, the upsample+edge-pad
    argmax matching, and the PCK math.
(b) Tracker: the ACTUAL ModelInference/Tracker of utils/tracking_model.py
    (TrackerHead soft-argmax, trajectory generation, cosine gating, anchor
    cycles, occlusion) vs gd3d's batched tracker on a shared tiny feature
    volume.

Heavy training-only deps are stubbed exactly as in
test_reference_loss_parity; the torch feature extractor is the gd3d
student itself (wrapped), so both sides consume bitwise-identical features
and any mismatch isolates HARNESS logic.
"""
import importlib.util
import shutil
import sys
import types

import numpy as np
import pytest
import torch

from test_reference_loss_parity import _install_stubs, _mod

pytestmark = pytest.mark.slow

REF = "/root/reference"


def _tv_functional_pad(img, padding, fill=0, padding_mode="constant"):
    """torchvision.transforms.functional.pad for tensors: padding is
    (left, top, right, bottom); 'edge' -> replicate."""
    left, top, right, bottom = padding
    mode = {"edge": "replicate", "symmetric": "reflect"}.get(
        padding_mode, padding_mode)
    if mode == "constant":
        return torch.nn.functional.pad(
            img, (left, right, top, bottom), mode="constant", value=fill)
    return torch.nn.functional.pad(img, (left, right, top, bottom), mode=mode)


def _load_ref_evaluate():
    _install_stubs()
    _mod("omegaconf", OmegaConf=object)
    sys.modules["torchvision.transforms.functional"].pad = _tv_functional_pad
    if f"{REF}/src" not in sys.path:
        sys.path.append(f"{REF}/src")
    if "ref_evaluate_timm" in sys.modules:
        return sys.modules["ref_evaluate_timm"]
    spec = importlib.util.spec_from_file_location(
        "ref_evaluate_timm", f"{REF}/src/evaluate_timm.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_evaluate_timm"] = mod
    spec.loader.exec_module(mod)
    return mod


class _TimmLike:
    """Stands in for `model.model` (the timm ViT): forward_features backed
    by the gd3d student, so both harnesses consume identical features.
    evaluate_timm's module-level imagenet_norm is an identity under the
    torchvision stub, so x arrives as the raw [0,1] canvas and the student
    applies its own (real) imagenet normalization — same as the gd3d side."""

    def __init__(self, student, params):
        self.student = student
        self.params = params

    def forward_features(self, x):
        import jax.numpy as jnp

        x01 = x.detach().numpy().transpose(0, 2, 3, 1)
        grid = self.student.dense_grid_features(
            self.params, jnp.asarray(x01), refine=False)  # (1, ph, pw, C)
        g = np.asarray(grid)
        tokens = g.reshape(1, -1, g.shape[-1])
        cls = np.zeros((1, 1, g.shape[-1]), np.float32)  # stripped by [:, 1:]
        return torch.from_numpy(np.concatenate([cls, tokens], axis=1))


def test_reference_semantic_transfer_real_csvs(tmp_path, monkeypatch):
    import jax

    from gd3d.core.config import StudentConfig
    from gd3d.eval.pck import semantic_transfer
    from gd3d.models.student import Student

    E = _load_ref_evaluate()

    # data/ tree: the REAL reference CSVs + fabricated images for every
    # aeroplane-category file they name
    import pandas as pd

    droot = tmp_path / "data" / "PF-dataset-PASCAL"
    (droot / "JPEGImages").mkdir(parents=True)
    names = set()
    for v in ("different", "same"):
        src = f"{REF}/data/test_pairs_pf_{v}_views.csv"
        shutil.copy(src, droot / f"test_pairs_pf_{v}_views.csv")
        df = pd.read_csv(src)
        sub = df[df.iloc[:, 2].astype(int) == 1]  # aeroplane
        names |= set(sub.iloc[:, 0]) | set(sub.iloc[:, 1])
    rng = np.random.RandomState(0)
    from PIL import Image

    for n in sorted(names):
        # n is 'PF-dataset-PASCAL/JPEGImages/xxx.jpg', resolved as
        # {path}/../{n} by both harnesses
        w, h = int(rng.randint(90, 160)), int(rng.randint(70, 130))
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            tmp_path / "data" / n)

    student = Student(StudentConfig(
        embed_dim=16, depth=2, num_heads=2, patch_size=16,
        pretrain_img_size=32, lora_start_block=99, use_adapters=False,
        target_res=640, depth_head_hidden=16,
    ))
    params = student.init(jax.random.key(0), img_size=32)

    # reference side: hard-coded 'data/...' paths and .cuda() calls
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)
    model = types.SimpleNamespace(model=_TimmLike(student, params))
    want = E.semantic_transfer(model, num_cats=1, same_view=False)

    got = semantic_transfer(
        student, params, str(droot), categories=["aeroplane"],
        same_view=False, img_size=640, refine=False,
    )

    for col in ("PCK0.05", "PCK0.10", "PCK0.15"):
        np.testing.assert_allclose(
            float(got[col].iloc[0]), float(want[col].iloc[0]),
            atol=1e-6, err_msg=col)
    # single category: the weighted mean degenerates to the value
    np.testing.assert_allclose(
        float(got["Weighted PCK0.10"].iloc[0]),
        float(want["Weighted PCK0.10"].iloc[0]), atol=1e-6)


def test_reference_tracker_inference_matches_gd3d():
    """Full tracker chain — trajectories (TrackerHead soft-argmax over
    cosine corr maps), cosine gating, anchor cycles, occlusion — vs the
    actual utils/tracking_model.py ModelInference on one shared feature
    volume."""
    _install_stubs()
    if REF not in sys.path:
        sys.path.append(REF)
    from utils import tracking_model as TM

    from gd3d.eval.tracker import TrackerConfig, infer_tracks

    # RangeNormalizer defaults to device='cuda'; force cpu
    orig_init = TM.RangeNormalizer.__init__

    def cpu_init(self, shapes, device="cpu"):
        orig_init(self, shapes, device="cpu")

    TM.RangeNormalizer.__init__ = cpu_init
    try:
        rng = np.random.RandomState(5)
        T, gh, gw, C = 4, 9, 13, 8
        ps, stride = 16, 8
        H = ps + (gh - 1) * stride  # 80
        W = ps + (gw - 1) * stride  # 112
        feats = rng.randn(T, C, gh, gw).astype(np.float32)
        video = rng.rand(T, 3, H, W).astype(np.float32)
        qp = np.array(
            [[20.0, 30.0, 0.0], [60.0, 25.0, 1.0], [90.0, 60.0, 3.0],
             [40.0, 70.0, 2.0]], np.float32)

        tracker = TM.Tracker(
            dino_features=torch.from_numpy(feats),
            video=torch.from_numpy(video),
            dino_patch_size=ps, stride=stride, device="cpu",
        )
        mi = TM.ModelInference(
            model=tracker, range_normalizer=tracker.range_normalizer,
            anchor_cosine_similarity_threshold=0.7,
            cosine_similarity_threshold=0.6,
        )
        with torch.no_grad():
            want_traj, want_occ = mi.infer(torch.from_numpy(qp))

        cfg = TrackerConfig(patch_size=ps, stride=stride, argmax_radius=35,
                            anchor_cos_threshold=0.7, cos_threshold=0.6,
                            video_h=H, video_w=W)
        got_traj, got_occ = infer_tracks(
            feats.transpose(0, 2, 3, 1), qp, cfg)

        np.testing.assert_allclose(
            got_traj, want_traj.numpy(), rtol=1e-4, atol=5e-3)
        np.testing.assert_array_equal(got_occ, want_occ.numpy().astype(bool))
    finally:
        TM.RangeNormalizer.__init__ = orig_init
