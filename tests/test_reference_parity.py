"""Reference-DIRECT parity tests (VERDICT.md item 6).

Unlike the transcription-based parity suites (test_mast3r_full_parity etc.,
which compare against the builder's own torch re-implementations), these
import the reference's ACTUAL modules from /root/reference and assert the
gd3d rebuild matches them numerically at tiny config. A transcription error
anywhere in the chain shows up here.

Fork points locked:
  - /root/reference/dust3r/dust3r/model.py:297-366 (cross-attn export,
    reciprocity + temperature softmax) via the full AsymmetricMASt3R forward
  - /root/reference/mast3r/catmlp_dpt_head.py:25-96 (catmlp+dpt head),
    covered by the same forward
  - /root/reference/vggt/layers/attention.py:51-85 (cross-frame blocks)
  - /root/reference/dust3r/croco/models/pos_embed.py:112-159 (RoPE2D)
  - /root/reference/mast3r/fast_nn.py:109-188 (reciprocal NN matcher)
"""
import sys
import types

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

REF = "/root/reference"


def _ref_paths():
    # croco blocks.py:23 has an unused `import timm  # TO TEST`; stub it
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    for p in (f"{REF}/dust3r", f"{REF}/dust3r/croco", REF):
        if p not in sys.path:
            sys.path.append(p)


# ---------------------------------------------------------------- MASt3R
def test_reference_mast3r_forward_matches_gd3d():
    """Full AsymmetricMASt3R (reference code, random tiny weights) vs gd3d
    Mast3r with converted weights: pts3d/conf/desc/desc_conf + the
    reciprocity-temperature cost volume."""
    import jax.numpy as jnp

    _ref_paths()
    from mast3r.model import AsymmetricMASt3R

    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3r, Mast3rConfig
    from gd3d.teachers.mast3r import convert_mast3r

    inf = float("inf")
    torch.manual_seed(0)
    # dec_depth must be >9 (catmlp_dpt_head.py:105 factory assert); widths tiny
    ref = AsymmetricMASt3R(
        desc_mode="norm", two_confs=True, desc_conf_mode=("exp", 0, inf),
        output_mode="pts3d+desc6", head_type="catmlp+dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        landscape_only=False, temperature=0.8,
        img_size=(32, 64), patch_size=16,
        enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=16, dec_depth=12, dec_num_heads=2,
        pos_embed="RoPE100",
    ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = Mast3rConfig(
        croco=CrocoConfig(
            patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=16, dec_depth=12, dec_num_heads=2,
        ),
        local_feat_dim=6, dpt_feature_dim=256, dpt_last_dim=128,
    )
    params = convert_mast3r(state, cfg)

    rng = np.random.RandomState(0)
    H, W = 32, 64
    im1 = (rng.rand(1, H, W, 3) * 2 - 1).astype(np.float32)
    im2 = (rng.rand(1, H, W, 3) * 2 - 1).astype(np.float32)
    t1 = torch.from_numpy(im1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(im2).permute(0, 3, 1, 2)
    # symmetrized direction batch, element 0 = (view1=img2, view2=img1)
    # exactly like make_pairs(symmetrize=True) + collate
    # (dust3r/inference.py:26-29); distinct instances -> direct encode path
    view1 = {"img": torch.cat([t2, t1]), "instance": ["0", "1"]}
    view2 = {"img": torch.cat([t1, t2]), "instance": ["2", "3"]}
    with torch.no_grad():
        res1, res2 = ref(view1, view2)

    out = Mast3r(cfg).apply(
        {"params": params}, jnp.asarray(im1), jnp.asarray(im2), 0.8
    )
    checks = [
        (out["res1"]["pts3d"], res1["pts3d"], "res1.pts3d"),
        (out["res1"]["conf"], res1["conf"], "res1.conf"),
        (out["res1"]["desc"], res1["desc"], "res1.desc"),
        (out["res1"]["desc_conf"], res1["desc_conf"], "res1.desc_conf"),
        (out["res2"]["pts3d_in_other_view"], res2["pts3d_in_other_view"],
         "res2.pts3d_in_other_view"),
        (out["res2"]["desc"], res2["desc"], "res2.desc"),
        (out["res2"]["tgt_attn_map"], res2["tgt_attn_map"],
         "res2.tgt_attn_map"),
    ]
    for got, want, name in checks:
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=5e-3, atol=2e-3,
            err_msg=name,
        )


# ------------------------------------------------------------------ VGGT
def test_reference_vggt_attention_cross_frame_matches_gd3d():
    """The forked VGGT Attention's cross-frame export (attention.py:51-85)
    vs gd3d VggtAttention: output tokens + the two off-diagonal blocks."""
    import functools

    import jax.numpy as jnp

    _ref_paths()
    from vggt.layers.attention import Attention

    from gd3d.models.vggt.layers import VggtAttention

    torch.manual_seed(1)
    dim, heads = 32, 2
    # production VGGT builds attention with LayerNorm(eps=1e-6)
    # (vggt/layers/vision_transformer.py), qk_norm on
    ref = Attention(
        dim, num_heads=heads, qk_norm=True, fused_attn=True,
        norm_layer=functools.partial(torch.nn.LayerNorm, eps=1e-6),
    ).eval()

    params = {
        "qkv": {
            "kernel": ref.qkv.weight.detach().numpy().T,
            "bias": ref.qkv.bias.detach().numpy(),
        },
        "proj": {
            "kernel": ref.proj.weight.detach().numpy().T,
            "bias": ref.proj.bias.detach().numpy(),
        },
        "q_norm": {
            "scale": ref.q_norm.weight.detach().numpy(),
            "bias": ref.q_norm.bias.detach().numpy(),
        },
        "k_norm": {
            "scale": ref.k_norm.weight.detach().numpy(),
            "bias": ref.k_norm.bias.detach().numpy(),
        },
    }

    rng = np.random.RandomState(2)
    N = 2 * (5 + 16)  # 2 frames x (5 special + 16 patch tokens)
    x = rng.randn(2, N, dim).astype(np.float32)
    with torch.no_grad():
        out_t, attn_t = ref(torch.from_numpy(x), return_attn=True,
                            temperature=0.7)

    gd = VggtAttention(dim, heads, qk_norm=True)
    out_j, attn_j = gd.apply(
        {"params": params}, jnp.asarray(x), return_attn=True,
        temperature=0.7,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy(), rtol=2e-4, atol=1e-5)
    # reference returns per-head maps cat'ed on batch; gd3d fuses the
    # head-mean every consumer applies (finetune_timm_vggt.py:390-392)
    np.testing.assert_allclose(
        np.asarray(attn_j), attn_t.mean(1).numpy(), rtol=2e-4, atol=1e-6)


# ---------------------------------------------------------------- RoPE2D
def test_reference_rope2d_matches_gd3d():
    """CroCo's torch RoPE2D fallback (pos_embed.py:112-159, the same math as
    the cuRoPE2D kernel) vs gd3d ops.rope2d."""
    import jax.numpy as jnp

    _ref_paths()
    from models.pos_embed import RoPE2D  # croco

    from gd3d.ops.rope2d import rope2d

    rope = RoPE2D(freq=100.0)
    rng = np.random.RandomState(3)
    B, Hh, N, D = 2, 3, 20, 16
    tokens = rng.randn(B, Hh, N, D).astype(np.float32)
    pos = rng.randint(0, 7, size=(B, N, 2)).astype(np.int64)
    with torch.no_grad():
        want = rope(torch.from_numpy(tokens), torch.from_numpy(pos)).numpy()
    got = rope2d(jnp.asarray(tokens), jnp.asarray(pos), 100.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------- fast_nn
def test_reference_fast_nn_matches_gd3d():
    """fast_reciprocal_NNs (reference torch/numpy code, dot metric,
    subsample 16) vs the gd3d static-shape on-device pipeline: identical
    correspondence sets."""
    import jax.numpy as jnp

    _ref_paths()
    from mast3r.fast_nn import fast_reciprocal_NNs

    from gd3d.distill.keypoints import merge_corres_static, reciprocal_nn_grid

    rng = np.random.RandomState(4)
    H = W = 32
    D = 8
    d1 = rng.randn(H, W, D).astype(np.float32)
    d2 = rng.randn(H, W, D).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)

    ref_xy1, ref_xy2 = fast_reciprocal_NNs(
        torch.from_numpy(d1), torch.from_numpy(d2),
        subsample_or_initxy1=16, device="cpu", dist="dot",
        block_size=2 ** 13,
    )
    ref_pairs = {
        (int(x1), int(y1), int(x2), int(y2))
        for (x1, y1), (x2, y2) in zip(ref_xy1, ref_xy2)
    }

    xy1, xy2, conv = reciprocal_nn_grid(
        jnp.asarray(d1), jnp.asarray(d2), H, W, subsample=16, max_iter=10)
    sxy1, sxy2, valid = merge_corres_static(xy1, xy2, conv, H * W, H * W)
    got_pairs = {
        (int(i1 % W), int(i1 // W), int(i2 % W), int(i2 // W))
        for i1, i2, v in zip(
            np.asarray(sxy1), np.asarray(sxy2), np.asarray(valid))
        if v
    }
    assert got_pairs == ref_pairs


def test_reference_vggt_tracker_matches_gd3d():
    """The ACTUAL reference BaseTrackerPredictor (CoTracker-style corr
    pyramid + EfficientUpdateFormer, track_modules/base_track_predictor.py)
    vs gd3d's, through the real weight converter — locks the corr-window
    flattening order (blocks.py:184 stacks meshgrid(dy, dx, 'ij') onto
    (x, y) coords: the row index drives the X offset), the flow embedding,
    and the iterative update."""
    import jax.numpy as jnp

    _ref_paths()
    from vggt.heads.track_modules.base_track_predictor import (
        BaseTrackerPredictor as RefTracker,
    )

    from gd3d.models.vggt.config import VggtConfig
    from gd3d.models.vggt.track import BaseTrackerPredictor
    from gd3d.teachers.vggt import convert_vggt_tracker

    cfg = VggtConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        num_register_tokens=4, dino_depth=2, dino_num_heads=2,
        camera_trunk_depth=1, camera_iterations=1, dpt_features=8,
        dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
        track_features=8, track_iters=2, track_stride=2, corr_levels=2,
        corr_radius=1, track_hidden_size=16, track_depth=2,
        # the reference BaseTrackerPredictor does not expose this; its
        # EfficientUpdateFormer default is 64
        num_virtual_tracks=64, track_max_scale=518.0,
    )
    torch.manual_seed(3)
    ref = RefTracker(
        stride=cfg.track_stride, corr_levels=cfg.corr_levels,
        corr_radius=cfg.corr_radius, latent_dim=cfg.track_features,
        hidden_size=cfg.track_hidden_size, depth=cfg.track_depth,
    ).eval()
    state = {f"track_head.tracker.{k}": v.detach().numpy()
             for k, v in ref.state_dict().items()}
    params = convert_vggt_tracker(state, cfg)

    rng = np.random.RandomState(7)
    B, S, HH, WW, C = 1, 2, 8, 8, cfg.track_features
    fmaps = rng.randn(B, S, HH, WW, C).astype(np.float32)
    qp = (rng.rand(B, 3, 2) * 12).astype(np.float32)

    with torch.no_grad():
        tpreds, tvis, tconf = ref(
            torch.from_numpy(qp),
            torch.from_numpy(fmaps).permute(0, 1, 4, 2, 3),
            iters=cfg.track_iters,
        )
    preds, vis, conf = BaseTrackerPredictor(cfg).apply(
        {"params": params}, jnp.asarray(qp), jnp.asarray(fmaps),
        iters=cfg.track_iters,
    )
    np.testing.assert_allclose(
        np.asarray(preds[-1]), tpreds[-1].numpy(), rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(vis), tvis.numpy(), rtol=3e-3, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(conf), tconf.numpy(), rtol=3e-3, atol=3e-4)


_VGGT_TINY_KW = dict(
    img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
    num_register_tokens=4, dino_depth=2, dino_num_heads=2,
    camera_trunk_depth=1, camera_iterations=1, dpt_features=8,
    dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
    track_features=8, track_iters=2, track_stride=2, corr_levels=2,
    corr_radius=1, track_hidden_size=16, track_depth=2,
    num_virtual_tracks=64, track_max_scale=518.0,
)


def test_reference_vggt_camera_head_matches_gd3d():
    """The ACTUAL reference CameraHead (adaLN-modulated trunk,
    camera_head.py:26-162) vs gd3d through the weight converter."""
    import jax.numpy as jnp

    _ref_paths()
    from vggt.heads.camera_head import CameraHead as RefCameraHead

    from gd3d.models.vggt.config import VggtConfig
    from gd3d.models.vggt.heads import CameraHead
    from gd3d.teachers.vggt import convert_vggt_camera_head

    cfg = VggtConfig(**_VGGT_TINY_KW)
    torch.manual_seed(5)
    ref = RefCameraHead(
        dim_in=2 * cfg.embed_dim, trunk_depth=cfg.camera_trunk_depth,
        num_heads=cfg.num_heads,
    ).eval()
    state = {f"camera_head.{k}": v.detach().numpy()
             for k, v in ref.state_dict().items()}
    params = convert_vggt_camera_head(state, cfg)

    rng = np.random.RandomState(5)
    tokens = rng.randn(1, 2, 9, 2 * cfg.embed_dim).astype(np.float32)
    with torch.no_grad():
        want = ref([torch.from_numpy(tokens)],
                   num_iterations=cfg.camera_iterations)[-1].numpy()
    got = np.asarray(CameraHead(cfg).apply(
        {"params": params}, jnp.asarray(tokens),
        num_iterations=cfg.camera_iterations))
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-5)


def test_reference_vggt_dpt_head_matches_gd3d():
    """The ACTUAL reference DPTHead (dpt_head.py:21-305) vs gd3d through
    the weight converter — locks projects/resize layers, fusion blocks,
    pos-embed grids, and activations."""
    import jax.numpy as jnp

    _ref_paths()
    from vggt.heads.dpt_head import DPTHead as RefDPTHead

    from gd3d.models.vggt.config import VggtConfig
    from gd3d.models.vggt.heads import VggtDPTHead
    from gd3d.teachers.vggt import _convert_vggt_dpt

    cfg = VggtConfig(**_VGGT_TINY_KW)
    torch.manual_seed(6)
    ref = RefDPTHead(
        dim_in=2 * cfg.embed_dim, patch_size=cfg.patch_size, output_dim=2,
        activation="exp", conf_activation="expp1",
        features=cfg.dpt_features, out_channels=list(cfg.dpt_out_channels),
        intermediate_layer_idx=list(cfg.dpt_hooks),
    ).eval()
    state = {f"depth_head.{k}": v.detach().numpy()
             for k, v in ref.state_dict().items()}
    params = _convert_vggt_dpt(state, "depth_head", cfg)

    rng = np.random.RandomState(6)
    tokens = [rng.randn(1, 2, 9, 2 * cfg.embed_dim).astype(np.float32)
              for _ in range(cfg.depth)]
    images = rng.rand(1, 2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        tw_pts, tw_conf = ref(
            [torch.from_numpy(t) for t in tokens],
            torch.from_numpy(images), patch_start_idx=5)
    pts, conf = VggtDPTHead(
        cfg, output_dim=2, activation="exp", conf_activation="expp1",
        features=cfg.dpt_features,
    ).apply({"params": params},
            [jnp.asarray(t) for t in tokens], (28, 28))
    np.testing.assert_allclose(
        np.asarray(pts).reshape(1, 2, 28, 28, 1), tw_pts.numpy(),
        rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(conf).reshape(1, 2, 28, 28), tw_conf.numpy(),
        rtol=5e-3, atol=5e-4)


def test_reference_vggt_aggregator_matches_gd3d():
    """The ACTUAL reference Aggregator (alternating frame/global attention
    over a real DINOv2 patchifier, models/aggregator.py:50-323) vs gd3d
    through convert_vggt — locks camera/register token slot expansion,
    the +1-shift RoPE positions, block alternation, and the per-layer
    frame||global concat, end to end. vit_small keeps it CPU-cheap (the
    token count is tiny at 28^2/14)."""
    import jax.numpy as jnp

    _ref_paths()
    from vggt.models.aggregator import Aggregator as RefAggregator

    from gd3d.models.vggt.aggregator import Aggregator
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import convert_vggt

    torch.manual_seed(7)
    ref = RefAggregator(
        img_size=28, patch_size=14, embed_dim=384, depth=2, num_heads=6,
        num_register_tokens=4, patch_embed="dinov2_vits14_reg",
    ).eval()
    state = {f"aggregator.{k}": v.detach().numpy()
             for k, v in ref.state_dict().items()}

    cfg = VggtConfig(
        img_size=28, patch_size=14, embed_dim=384, depth=2, num_heads=6,
        num_register_tokens=4, dino_depth=12, dino_num_heads=6,
        dpt_hooks=(0, 0, 1, 1),
    )
    params = convert_vggt(state, cfg)["aggregator"]

    rng = np.random.RandomState(8)
    images = rng.rand(1, 2, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        want_list, psi, want_attn = ref(
            torch.from_numpy(images).permute(0, 1, 4, 2, 3))
    assert psi == cfg.patch_start_idx

    got_list, got_attn = Aggregator(cfg).apply(
        {"params": params}, jnp.asarray(images))
    assert len(got_list) == len(want_list) == cfg.depth
    for i, (got, want) in enumerate(zip(got_list, want_list)):
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=3e-3, atol=3e-4,
            err_msg=f"layer {i}")
    # reference attn is layer-meaned per-head maps cat'ed on batch; gd3d
    # fuses the head-mean every consumer applies
    np.testing.assert_allclose(
        np.asarray(got_attn), want_attn.mean(1).numpy(),
        rtol=3e-3, atol=3e-5)


def test_reference_occlusion_rule_matches_gd3d():
    """The DINO-tracker occlusion rule (tracking_model.py:544-553:
    median cycle-consistency distance over VISIBLE anchors vs the max
    anchor median error, OR'ed with the cosine gate) — called directly on
    the reference method (it reads no state; thresholds are arguments)
    vs gd3d's batched compute_occlusion."""
    _ref_paths()
    # tracking_model imports torchvision (absent here) only for its video
    # transforms, which this test never touches — stub it like timm
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    from utils.tracking_model import ModelInference

    from gd3d.eval.tracker import TrackerConfig, compute_occlusion

    rng = np.random.RandomState(11)
    N, T = 5, 12
    trajs = rng.rand(N, T, 2).astype(np.float32) * 50
    cos = rng.rand(N, T).astype(np.float32)
    anchors = rng.rand(N, T, T, 2).astype(np.float32) * 50
    cfg = TrackerConfig(patch_size=14, stride=7, video_h=56, video_w=56,
                        anchor_cos_threshold=0.5, cos_threshold=0.4)

    got = compute_occlusion(trajs, cos, anchors, cfg)
    for n in range(N):
        vis = cos[n] >= cfg.anchor_cos_threshold
        if vis.sum() == 0:
            continue  # gd3d's guard; the reference caller never hits this
        want = ModelInference.compute_occ_pred_for_qp(
            None,
            torch.from_numpy(anchors[n][vis]),
            torch.from_numpy(trajs[n]),
            torch.from_numpy(cos[n]),
            cfg.anchor_cos_threshold, cfg.cos_threshold,
        ).numpy()
        np.testing.assert_array_equal(got[n], want, err_msg=f"qp {n}")


def test_reference_functions_utils_match_gd3d():
    """The reference's hot geometry/feature utilities imported DIRECTLY
    (utils/functions.py; kornia is stubbed — it is only used by
    post_process_depth, untouched here) vs gd3d's ops:
    interpolate_features, get_masked_patch_cost, get_coview_masks, and
    the deterministic NMS keypoint set."""
    import jax
    import jax.numpy as jnp

    _ref_paths()
    for name in ("kornia", "kornia.filters", "kornia.morphology",
                 "torchvision", "torchvision.transforms"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    # `from torchvision.transforms import functional` needs the attribute
    sys.modules["torchvision.transforms"].functional = types.ModuleType(
        "torchvision.transforms.functional")
    if REF not in sys.path:
        sys.path.append(REF)
    from utils import functions as RF

    from gd3d.ops.geometry import coview_masks
    from gd3d.ops.interpolate import interpolate_features
    from gd3d.ops.masks import masked_patch_cost, patch_mask_from_kps
    from gd3d.ops.nms import sample_keypoints_nms

    rng = np.random.RandomState(13)

    # --- interpolate_features (bilinear patch-grid sampling, :55-76)
    B, C, ph, pw = 2, 8, 6, 9
    h, w = 84, 126
    desc = rng.randn(B, C, ph, pw).astype(np.float32)
    pts = (rng.rand(B, 16, 2) * [w - 14, h - 14] + 7).astype(np.float32)
    with torch.no_grad():
        want = RF.interpolate_features(
            torch.from_numpy(desc), torch.from_numpy(pts), h, w,
            normalize=True).numpy()
    got = interpolate_features(
        jnp.asarray(desc), jnp.asarray(pts), h, w, normalize=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    # --- get_masked_patch_cost (:402-430; masks are per-grid, shared
    # across the batch dim)
    N = ph * pw
    cost = rng.randn(B, N, N).astype(np.float32)
    m1 = rng.rand(N) > 0.4
    m2 = rng.rand(N) > 0.4
    with torch.no_grad():
        want_c = RF.get_masked_patch_cost(
            torch.from_numpy(cost), torch.from_numpy(m1),
            torch.from_numpy(m2), use_softmax=True,
            temperature=0.5).numpy()
    got_c = masked_patch_cost(
        jnp.asarray(cost), jnp.asarray(m1), jnp.asarray(m2),
        use_softmax=True, temperature=0.5)
    np.testing.assert_allclose(np.asarray(got_c), want_c,
                               rtol=1e-4, atol=1e-6)

    # --- get_coview_masks (:462-472, incl. the extrinsic1 quirk)
    H, W = 24, 32
    pm1 = (rng.rand(H, W, 3) + [0, 0, 1.5]).astype(np.float32)
    pm2 = (rng.rand(H, W, 3) + [0, 0, 1.5]).astype(np.float32)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                 np.float32)
    E1 = np.eye(3, 4, dtype=np.float32)
    E2 = np.eye(3, 4, dtype=np.float32)
    E2[0, 3] = 0.4
    with torch.no_grad():
        w1, w2 = RF.get_coview_masks(
            torch.from_numpy(pm1), torch.from_numpy(pm2),
            torch.from_numpy(K), torch.from_numpy(E1),
            torch.from_numpy(K), torch.from_numpy(E2), (H, W))
    g1, g2 = coview_masks(jnp.asarray(pm1), jnp.asarray(pm2),
                          jnp.asarray(K), jnp.asarray(E1),
                          jnp.asarray(K), jnp.asarray(E2), (H, W))
    np.testing.assert_array_equal(np.asarray(g1), w1.numpy())
    np.testing.assert_array_equal(np.asarray(g2), w2.numpy())

    # --- sample_keypoints_nms: the DETERMINISTIC maxima set (:475-500);
    # both sides subsample it randomly, so compare the full set with
    # N large enough to keep everything
    mask = rng.rand(H, W) > 0.3
    conf = rng.rand(H, W).astype(np.float32)
    with torch.no_grad():
        want_kp = RF.sample_keypoints_nms(
            torch.from_numpy(mask), torch.from_numpy(conf),
            N=10_000, min_distance=2, device="cpu").numpy()
    kps, valid = sample_keypoints_nms(
        jnp.asarray(mask), jnp.asarray(conf), num=H * W,
        min_distance=2, rng=jax.random.key(0))
    got_set = {tuple(map(int, k)) for k in np.asarray(kps)[np.asarray(valid)]}
    want_set = {tuple(map(int, k)) for k in want_kp}
    assert got_set == want_set
