"""Reference-DIRECT parity for the full distillation loss stack.

Round-3 verdict item 1: every link upstream of the losses (models, utils,
keypoints) already has reference-direct coverage, but the three distillation
losses and the composed per-step loss VALUE were locked only by the
builder's own transcriptions. These tests import the reference's ACTUAL
loss code — `utils/losses.py` and the `calculate_{depth,cost,matching}_loss`
methods of `FinetuneMASt3RTIMM` (src/finetune_timm_mast3r.py:472-589) and
`FinetuneVGGTTIMM` (src/finetune_timm_vggt.py:464-575) — and drive them with
the EXACT intermediate tensors gd3d's jitted steps consume
(mast3r_distill_loss / vggt_distill_loss with return_aux=True), with the
depth-diff head weights converted both ways. Asserted: all four loss
scalars AND the weighted step total.

The reference modules import their full training environment; the heavy
GPU/training-only deps (lightning, timm, torchvision, kornia, hydra, ...)
are stubbed — none of their code runs, the loss methods only touch torch.
The dummy `self` bypasses the reference's student/teacher forwards (those
have their own reference-direct suites) so a failure here isolates loss
math, masking semantics, or composition.
"""
import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

REF = "/root/reference"


def _mod(name, **attrs):
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


class _Identity:
    """Stands in for torchvision transform classes built at import time
    (dust3r/dust3r/utils/image.py:23 builds ImgNorm at module level)."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        return x


def _install_stubs():
    for p in (f"{REF}/dust3r", f"{REF}/dust3r/croco", REF):
        if p not in sys.path:
            sys.path.append(p)
    _mod("timm")
    _mod("visdom", Visdom=object)
    pl = _mod(
        "pytorch_lightning",
        LightningModule=type("LightningModule", (), {}),
        Callback=object,
        Trainer=object,
    )
    pl.loggers = _mod("pytorch_lightning.loggers", TensorBoardLogger=object)
    pl.callbacks = _mod("pytorch_lightning.callbacks", ModelCheckpoint=object)
    tv = _mod("torchvision")
    fn = _mod("torchvision.transforms.functional")
    tv.transforms = _mod(
        "torchvision.transforms",
        functional=fn,
        Compose=_Identity,
        ToTensor=_Identity,
        Normalize=_Identity,
    )
    # PEP 562 fallback: any other transform class (ColorJitter, ...) other
    # reference modules pull at import time resolves to the no-op — this
    # stub is installed process-wide and must not starve later tests
    # (test_stereo_views' crop test imports dust3r.datasets, whose
    # __init__ builds a ColorJitter at import)
    tv.transforms.__getattr__ = lambda name: _Identity
    _mod("kornia")
    _mod("kornia.filters")
    _mod("kornia.morphology")
    _mod("albumentations")
    pc = _mod("pycocotools")
    pc.coco = _mod("pycocotools.coco", COCO=object)
    _mod("hydra", main=lambda *a, **k: (lambda f: f))


def _load_ref_ft(name):
    """Import the actual reference finetune module (mast3r | vggt)."""
    _install_stubs()
    modname = f"ref_ft_{name}"
    if modname in sys.modules:
        return sys.modules[modname]
    spec = importlib.util.spec_from_file_location(
        modname, f"{REF}/src/finetune_timm_{name}.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[modname] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_depth_head(params, cfg):
    """gd3d DepthDiffHead params -> the reference DepthAwareFeatureFusion
    (utils/model.py:88-127) via the checkpoint-layout converter."""
    from utils.model import DepthAwareFeatureFusion

    from gd3d.core.checkpoint import export_reference_layout
    from gd3d.models.student import split_params

    flat = export_reference_layout(split_params(params)[0], cfg.student)
    sd = {
        k.split("depth_diff_head.", 1)[1]: torch.from_numpy(np.asarray(v))
        for k, v in flat.items()
        if k.startswith("depth_diff_head.")
    }
    head = DepthAwareFeatureFusion(
        cfg.student.embed_dim, hidden_dim=cfg.student.depth_head_hidden
    )
    head.load_state_dict(sd)
    return head.eval()


def _route(mapping):
    """Feature-extractor stand-in keyed by the rgb tensor identity."""

    def f(rgb, *a, **k):
        return mapping[id(rgb)]

    return f


def _t(x):
    return torch.from_numpy(np.asarray(x)).float()


# ------------------------------------------------------------- utils/losses
def test_reference_kl_divergence_map_matches_gd3d():
    _install_stubs()
    import jax.numpy as jnp
    from utils import losses as RL

    from gd3d.ops.losses import kl_divergence_map

    rng = np.random.RandomState(3)
    p = np.abs(rng.rand(2, 12, 12)).astype(np.float32)
    q = np.abs(rng.rand(2, 12, 12)).astype(np.float32)
    p[0, 3] = 0.0  # exercise the eps clamp
    with torch.no_grad():
        want = RL.kl_divergence_map(torch.from_numpy(p), torch.from_numpy(q))
    got = kl_divergence_map(jnp.asarray(p), jnp.asarray(q))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


# ----------------------------------------------------------------- MASt3R
def test_reference_mast3r_loss_stack_matches_gd3d():
    """All four loss scalars + the weighted total of the jitted gd3d MASt3R
    distill step vs the ACTUAL reference calculate_{depth,cost,matching}_loss
    + utils/losses.py on identical inputs and converted head weights."""
    import jax
    import jax.numpy as jnp

    from gd3d.core.config import DistillConfig, KeypointConfig, StudentConfig
    from gd3d.distill.mast3r_step import mast3r_distill_loss
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.models.student import Student
    from gd3d.teachers.mast3r import Mast3rTeacher

    M = _load_ref_ft("mast3r")

    cfg = DistillConfig(
        teacher="mast3r",
        dataset="objaverse",
        student=StudentConfig(
            embed_dim=32, depth=8, num_heads=2, patch_size=16,
            pretrain_img_size=32, lora_start_block=4, use_adapters=True,
            adapter_bottleneck=8, target_res=64, downsample_factor=8,
            depth_head_hidden=16,
        ),
        keypoints=KeypointConfig(nn_subsample=16),
    )
    tiny_teacher = Mast3rConfig(
        croco=CrocoConfig(
            patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
        ),
        local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16,
    )
    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=32)
    teacher = Mast3rTeacher(tiny_teacher)
    H, W = 64, 96
    tparams = teacher.init_params(jax.random.key(1), hw=(H, W))

    rng = np.random.RandomState(7)
    batch = {
        "rgb_1": jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32),
        "rgb_mast3r_1": jnp.asarray(rng.rand(1, H, W, 3) * 2 - 1, jnp.float32),
        "rgb_mast3r_2": jnp.asarray(rng.rand(1, H, W, 3) * 2 - 1, jnp.float32),
        "intrinsic": jnp.asarray(
            np.tile(np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]],
                             np.float32), (1, 1, 1))),
        "depth_1": jnp.asarray(rng.rand(1, 128, 128), jnp.float32),
        "depth_2": jnp.asarray(rng.rand(1, 128, 128), jnp.float32),
    }

    def run(params, tparams, batch):
        return mast3r_distill_loss(
            student, teacher, cfg, params, tparams, batch, 1.0,
            has_depth=True, return_aux=True,
        )

    _, metrics = jax.jit(run)(params, tparams, batch)
    aux = jax.tree_util.tree_map(np.asarray, metrics["aux"])
    v = aux["valid"][0].astype(bool)
    n_valid = int(v.sum())
    assert n_valid >= 4, "need live keypoints for a meaningful comparison"

    # reference-side inputs: valid keypoints only (the reference filters
    # dynamically; gd3d pads + masks)
    kp1 = _t(aux["kp_1"][0][v])[None]
    kp2 = _t(aux["kp_2"][0][v])[None]
    kp_feat_1 = _t(aux["kp_feat_1"][0][v])[None]
    kp_feat_2 = _t(aux["kp_feat_2"][0][v])[None]
    desc_1 = _t(aux["desc_1"][0][v])[None]
    desc_2 = _t(aux["desc_2"][0][v])[None]

    head = _torch_depth_head(params, cfg)
    obj = object.__new__(M.FinetuneMASt3RTIMM)
    obj.device = torch.device("cpu")
    obj.depth_diff_head = head
    obj.thres3d_neg = cfg.keypoints.thres3d_neg
    obj.patch_size = cfg.student.patch_size

    rgb1 = torch.zeros(1, 3, H, W)
    rgb2 = torch.zeros(1, 3, H, W)
    obj.get_intermediate_feature = _route(
        {id(rgb1): kp_feat_1, id(rgb2): kp_feat_2})
    obj.get_feature = _route({id(rgb1): desc_1, id(rgb2): desc_2})
    obj.get_feature_cost = _route(
        {id(rgb1): _t(aux["fc_1_raw"][0])[None],
         id(rgb2): _t(aux["fc_2_raw"][0])[None]})

    with torch.no_grad():
        ref_depth, ref_intra = M.FinetuneMASt3RTIMM.calculate_depth_loss(
            obj, _t(aux["depth_1"][0]), _t(aux["depth_2"][0]),
            rgb1, rgb2, kp1, kp2,
        )
        ref_kl = M.FinetuneMASt3RTIMM.calculate_cost_loss(
            obj, rgb1, rgb2, kp1, kp2,
            _t(aux["teacher_cost_1"][0]), _t(aux["teacher_cost_2"][0]),
            batch_idx=0,
        )
        ref_ap = M.FinetuneMASt3RTIMM.calculate_matching_loss(
            obj, rgb1, rgb2, kp1, kp2,
            _t(aux["pts3d_1_map"][0]), _t(aux["pts3d_2_from_1_map"][0]),
        )

    np.testing.assert_allclose(
        float(metrics["depth_loss"]), float(ref_depth), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["intra_depth_loss"]), float(ref_intra),
        rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["kl_loss"]), float(ref_kl), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["ap_loss"]), float(ref_ap), rtol=2e-4, atol=1e-6)

    # weighted step total with the reference ctor defaults
    # (finetune_timm_mast3r.py:79-84: ap 1, depth 0, intra 1, kl 1)
    w = cfg.loss_weights
    assert (w.ap, w.depth, w.intra_depth, w.kl) == (1.0, 0.0, 1.0, 1.0)
    ref_total = (w.ap * float(ref_ap) + w.depth * float(ref_depth)
                 + w.intra_depth * float(ref_intra) + w.kl * float(ref_kl))
    np.testing.assert_allclose(
        float(metrics["loss"]), ref_total, rtol=2e-4, atol=1e-6)

    # the unused margin variant (utils/losses.py:44-69) against the actual
    # reference function, same head weights
    from utils import losses as RL

    from gd3d.ops.losses import intra_depth_margin_loss

    kp_depth_1 = _t(aux["kp_depth_1"][0][v])[None]
    diff = kp_feat_1[:, :, None, :] - kp_feat_1[:, None, :, :]
    with torch.no_grad():
        want = RL.intra_depth_loss(head, kp_feat_1, kp_depth_1)
        Nv = kp_feat_1.shape[1]
        pred = head(diff.reshape(1, -1, kp_feat_1.shape[-1])).reshape(
            1, Nv, Nv)
    got = intra_depth_margin_loss(
        jnp.asarray(pred.numpy()), jnp.asarray(kp_depth_1.numpy()))
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4, atol=1e-6)


# ------------------------------------------------------------------- VGGT
def test_reference_vggt_loss_stack_matches_gd3d():
    """Same contract for the VGGT step: co-view-mask KL path, VGGT depth
    maps, world-point AP with the legacy rpos formula
    (src/finetune_timm_vggt.py:464-575)."""
    import jax
    import jax.numpy as jnp

    from gd3d.core.config import (
        DistillConfig,
        KeypointConfig,
        LossWeights,
        StudentConfig,
    )
    from gd3d.distill.vggt_step import vggt_distill_loss
    from gd3d.models.student import Student
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher

    M = _load_ref_ft("vggt")

    cfg = DistillConfig(
        teacher="vggt",
        dataset="scannetpp",
        student=StudentConfig(
            embed_dim=32, depth=8, num_heads=2, patch_size=16,
            pretrain_img_size=32, lora_start_block=4, use_adapters=True,
            adapter_bottleneck=8, target_res=64, depth_head_hidden=16,
        ),
        loss_weights=LossWeights(1.0, 1.0, 1.0, 1.0),
        keypoints=KeypointConfig(nms_num=48, nms_min_distance=2),
    )
    tiny = VggtConfig(
        img_size=42, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        num_register_tokens=4, dino_depth=2, dino_num_heads=2,
        camera_trunk_depth=1, camera_iterations=2, dpt_features=8,
        dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
        track_features=8, track_iters=2, track_stride=2, corr_levels=2,
        corr_radius=1, track_hidden_size=16, track_depth=2,
        num_virtual_tracks=4,
    )
    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=32)
    teacher = VggtTeacher(tiny)
    H = W = 42
    tparams = teacher.init_params(jax.random.key(1), hw=(H, W))

    # batch seed chosen so the NMS/co-view/track pipeline yields >=8 live
    # keypoints at this tiny geometry (border=3 eats most of a 42px image)
    rng = np.random.RandomState(7)
    batch = {
        "rgb_1": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32),
        "rgb_vggt": jnp.asarray(rng.rand(1, 2, H, W, 3), jnp.float32),
    }

    def run(params, tparams, batch, rng):
        return vggt_distill_loss(
            student, teacher, cfg, params, tparams, batch, 1.0, rng,
            return_aux=True,
        )

    _, metrics = jax.jit(run)(params, tparams, batch, jax.random.key(2))
    aux = jax.tree_util.tree_map(np.asarray, metrics["aux"])
    v = aux["valid"][0].astype(bool)
    n_valid = int(v.sum())
    assert n_valid >= 8, "need live keypoints for a meaningful comparison"

    kp1 = _t(aux["kp_1"][0][v])[None]
    kp2 = _t(aux["kp_2"][0][v])[None]
    kp_feat_1 = _t(aux["kp_feat_1"][0][v])[None]
    kp_feat_2 = _t(aux["kp_feat_2"][0][v])[None]
    desc_1 = _t(aux["desc_1"][0][v])[None]
    desc_2 = _t(aux["desc_2"][0][v])[None]

    head = _torch_depth_head(params, cfg)
    obj = object.__new__(M.FinetuneVGGTTIMM)
    obj.device = torch.device("cpu")
    obj.depth_diff_head = head
    obj.thres3d_neg = cfg.keypoints.thres3d_neg
    obj.patch_size = cfg.student.patch_size
    obj.resize_patch_size = tiny.patch_size

    rgb1 = torch.zeros(1, 3, H, W)
    rgb2 = torch.zeros(1, 3, H, W)
    obj.get_intermediate_feature = _route(
        {id(rgb1): kp_feat_1, id(rgb2): kp_feat_2})
    obj.get_feature = _route({id(rgb1): desc_1, id(rgb2): desc_2})
    obj.get_feature_cost = _route(
        {id(rgb1): _t(aux["fc_1_raw"][0])[None],
         id(rgb2): _t(aux["fc_2_raw"][0])[None]})

    vggt_features = {
        "depth_pred_1": _t(aux["depth_pred_1"][0]),
        "depth_pred_2": _t(aux["depth_pred_2"][0]),
    }
    with torch.no_grad():
        ref_depth, ref_intra = M.FinetuneVGGTTIMM.calculate_depth_loss(
            obj, vggt_features, rgb1, rgb2, kp1, kp2,
        )
        ref_kl = M.FinetuneVGGTTIMM.calculate_cost_loss(
            obj, rgb1, rgb2,
            _t(aux["teacher_cost_1"]), _t(aux["teacher_cost_2"]),
            mask_1=torch.from_numpy(aux["mask_1"][0]),
            mask_2=torch.from_numpy(aux["mask_2"][0]),
        )
        ref_ap = M.FinetuneVGGTTIMM.calculate_matching_loss(
            obj, rgb1, rgb2, kp1, kp2,
            _t(aux["point_map_view_1"][0]), _t(aux["point_map_view_2"][0]),
        )

    np.testing.assert_allclose(
        float(metrics["depth_loss"]), float(ref_depth), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["intra_depth_loss"]), float(ref_intra),
        rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["kl_loss"]), float(ref_kl), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(metrics["ap_loss"]), float(ref_ap), rtol=2e-4, atol=1e-6)

    # weighted total: the VGGT module trains with all weights 1.0
    # (src/finetune_timm_vggt.py:86-89)
    ref_total = (float(ref_ap) + float(ref_depth) + float(ref_intra)
                 + float(ref_kl))
    np.testing.assert_allclose(
        float(metrics["loss"]), ref_total, rtol=2e-4, atol=1e-6)
