"""Reference-DIRECT parity at TRUE production shapes (VERDICT r2 item 6).

test_reference_parity.py locks the fork points at tiny config; shape-
dependent quirks are invisible there. These tests instantiate the
reference's ACTUAL modules (random weights, fp32, CPU) at real geometry:

  - AsymmetricMASt3R at the ViT-L/BaseDecoder-512 production config and the
    ScanNet++ 336x512 true_shape: locks transpose_to_landscape dispatch
    (identity on landscape, dust3r/dust3r/utils/misc.py:54 — the gd3d
    models assume W >= H), RoPE at the true 21x32 grid, and the catmlp-DPT
    head at full resolution.
  - The VGGT DINOv2 patchifier at 518^2 (the native 37^2 pos-embed grid,
    no interpolation) AND at 392x518 (the bicubic+antialias interpolation
    with the (w0, h0) size quirk, vggt/layers/vision_transformer.py:183-213,
    interpolate_antialias=True per vggt/models/aggregator.py:157).
"""
import sys
import types

import numpy as np
import pytest
import torch

pytestmark = pytest.mark.slow

REF = "/root/reference"


def _ref_paths():
    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    for p in (f"{REF}/dust3r", f"{REF}/dust3r/croco", REF):
        if p not in sys.path:
            sys.path.append(p)


def test_reference_mast3r_fullsize_336x512_matches_gd3d():
    """Full production widths (enc ViT-L 1024/24/16, dec 768/12/12, desc 24,
    DPT 256) at the ScanNet++ 336x512 true_shape; random weights, fp32.

    Matches the checkpoint config of
    naver/MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric as constructed at
    /root/reference/mast3r/model.py:40-68 + src/finetune_timm_mast3r.py:107.
    """
    import jax.numpy as jnp

    _ref_paths()
    from mast3r.model import AsymmetricMASt3R

    from gd3d.models.mast3r import Mast3r, Mast3rConfig
    from gd3d.teachers.mast3r import convert_mast3r

    inf = float("inf")
    torch.manual_seed(0)
    ref = AsymmetricMASt3R(
        desc_mode="norm", two_confs=True, desc_conf_mode=("exp", 0, inf),
        output_mode="pts3d+desc24", head_type="catmlp+dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        landscape_only=False, temperature=1.0,
        img_size=(512, 512), patch_size=16,
        enc_embed_dim=1024, enc_depth=24, enc_num_heads=16,
        dec_embed_dim=768, dec_depth=12, dec_num_heads=12,
        pos_embed="RoPE100",
    ).eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = Mast3rConfig()  # the production default IS this config
    params = convert_mast3r(state, cfg)

    rng = np.random.RandomState(0)
    H, W = 336, 512
    im1 = (rng.rand(1, H, W, 3) * 2 - 1).astype(np.float32)
    im2 = (rng.rand(1, H, W, 3) * 2 - 1).astype(np.float32)
    t1 = torch.from_numpy(im1).permute(0, 3, 1, 2)
    t2 = torch.from_numpy(im2).permute(0, 3, 1, 2)
    view1 = {"img": torch.cat([t2, t1]), "instance": ["0", "1"],
             "true_shape": torch.tensor([[H, W], [H, W]])}
    view2 = {"img": torch.cat([t1, t2]), "instance": ["2", "3"],
             "true_shape": torch.tensor([[H, W], [H, W]])}
    with torch.no_grad():
        res1, res2 = ref(view1, view2)

    out = Mast3r(cfg).apply(
        {"params": params}, jnp.asarray(im1), jnp.asarray(im2), 1.0
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
            np.asarray(got), want.numpy(), rtol=5e-3, atol=5e-3,
            err_msg=name,
        )


@pytest.mark.parametrize("hw", [(518, 518), (392, 518)])
def test_reference_dinov2_pos_embed_fullsize_matches_gd3d(hw):
    """DINOv2-L patchifier at the VGGT native 518 geometry (37^2 pos grid,
    returned untouched) and at 392x518 (bicubic antialias interpolation,
    (w0, h0) size-order quirk). One transformer block keeps it cheap; the
    pos-embed path is depth-independent."""
    import jax.numpy as jnp

    _ref_paths()
    from functools import partial

    from vggt.layers import MemEffAttention, NestedTensorBlock as Block
    from vggt.layers.vision_transformer import DinoVisionTransformer

    from gd3d.models.vggt.config import VggtConfig
    from gd3d.models.vggt.dinov2 import DinoV2
    from gd3d.teachers.convert import _conv, _layernorm, _stack_trees
    from gd3d.teachers.vggt import _ls_block

    torch.manual_seed(0)
    ref = DinoVisionTransformer(
        img_size=518, patch_size=14, embed_dim=1024, depth=1, num_heads=16,
        mlp_ratio=4, init_values=1.0, num_register_tokens=4,
        interpolate_antialias=True, interpolate_offset=0.0,
        block_fn=partial(Block, attn_class=MemEffAttention),
        block_chunks=0,
    ).eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = VggtConfig(dino_depth=1)
    params = {
        "cls_token": state["cls_token"],
        "pos_embed": state["pos_embed"],
        "register_tokens": state["register_tokens"],
        "patch_embed": _conv(state, "patch_embed.proj"),
        "norm": _layernorm(state, "norm"),
        "blocks": _stack_trees(
            [_ls_block(state, "blocks.0", qk_norm=False, ls=True)]),
    }

    H, W = hw
    rng = np.random.RandomState(1)
    x = rng.rand(1, H, W, 3).astype(np.float32)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        want = ref.forward_features(xt)["x_norm_patchtokens"].numpy()

    got = DinoV2(cfg).apply(
        {"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=2e-4, atol=2e-5)
