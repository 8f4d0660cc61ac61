"""Cross-check the flax ViT against a torch transcription of timm's
VisionTransformer semantics (pre-norm blocks, exact GELU, dynamic-size
bicubic pos-embed resampling), using the weight converter."""
import pytest
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gd3d.core.config import StudentConfig
from gd3d.models.vit import ViT, resample_pos_embed
from gd3d.teachers.convert import convert_timm_vit, graft_pretrained_vit

CFG = StudentConfig(
    embed_dim=32,
    depth=2,
    num_heads=2,
    patch_size=8,
    pretrain_img_size=32,
    lora_start_block=99,
    use_adapters=False,
)


class TAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * (C // self.heads) ** -0.5
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TMlp(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)  # timm CLIP: plain LayerNorm (1e-5)
        self.attn = TAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = TMlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class TPatchEmbed(nn.Module):
    def __init__(self, dim, ps):
        super().__init__()
        # timm CLIP variants: bias=not pre_norm -> no patch-embed bias
        self.proj = nn.Conv2d(3, dim, ps, ps, bias=False)


class TViT(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dim = cfg.embed_dim
        self.patch_embed = TPatchEmbed(dim, cfg.patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        g = cfg.pretrain_img_size // cfg.patch_size
        self.pos_embed = nn.Parameter(torch.randn(1, g * g + 1, dim) * 0.02)
        self.blocks = nn.ModuleList(
            [TBlock(dim, cfg.num_heads) for _ in range(cfg.depth)]
        )
        self.norm = nn.LayerNorm(dim)
        # timm CLIP: pre_norm=True adds a pre-blocks LayerNorm
        self.norm_pre = nn.LayerNorm(dim)
        self.grid = g

    def forward_features(self, x):
        x = self.patch_embed.proj(x)  # (B, C, gh, gw)
        gh, gw = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)
        pos = self.pos_embed
        if (gh, gw) != (self.grid, self.grid):
            pre, patch = pos[:, :1], pos[:, 1:]
            p = patch.reshape(1, self.grid, self.grid, -1).permute(0, 3, 1, 2)
            p = F.interpolate(p, size=(gh, gw), mode="bicubic", align_corners=False)
            pos = torch.cat([pre, p.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)], 1)
        x = torch.cat([self.cls_token.expand(x.shape[0], -1, -1), x], dim=1)
        x = x + pos
        x = self.norm_pre(x)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def _flax_params_from_torch(tvit):
    state = {k: v.detach().numpy() for k, v in tvit.state_dict().items()}
    converted = convert_timm_vit(state, CFG)
    fresh = ViT(CFG).init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    return graft_pretrained_vit(fresh, converted)


@pytest.mark.slow
def test_vit_matches_torch_native_size():
    torch.manual_seed(0)
    tvit = TViT(CFG).eval()
    params = _flax_params_from_torch(tvit)
    x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = tvit.forward_features(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        ViT(CFG).apply({"params": params}, jnp.asarray(x))["tokens"]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_vit_matches_torch_dynamic_size():
    """48x48 input exercises the bicubic pos-embed resample (a=-0.75)."""
    torch.manual_seed(1)
    tvit = TViT(CFG).eval()
    params = _flax_params_from_torch(tvit)
    x = np.random.RandomState(1).rand(1, 48, 48, 3).astype(np.float32)
    with torch.no_grad():
        want = tvit.forward_features(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(
        ViT(CFG).apply({"params": params}, jnp.asarray(x))["tokens"]
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_resample_pos_embed_matches_torch_bicubic():
    rng = np.random.RandomState(2)
    pos = rng.randn(1, 17, 6).astype(np.float32)  # 4x4 grid + cls
    got = np.asarray(resample_pos_embed(jnp.asarray(pos), (7, 5)))
    patch = torch.from_numpy(pos[:, 1:]).reshape(1, 4, 4, 6).permute(0, 3, 1, 2)
    want_patch = F.interpolate(patch, size=(7, 5), mode="bicubic", align_corners=False)
    want = np.concatenate(
        [pos[:, :1], want_patch.permute(0, 2, 3, 1).reshape(1, 35, 6).numpy()], 1
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lora_is_zero_impact_at_init():
    """lora_b zero-init => grafted model output identical to the base."""
    cfg_lora = StudentConfig(
        embed_dim=32, depth=2, num_heads=2, patch_size=8,
        pretrain_img_size=32, lora_start_block=0, use_adapters=False,
    )
    torch.manual_seed(3)
    tvit = TViT(CFG).eval()
    state = {k: v.detach().numpy() for k, v in tvit.state_dict().items()}

    x = jnp.asarray(np.random.RandomState(3).rand(1, 32, 32, 3).astype(np.float32))
    base_fresh = ViT(CFG).init(jax.random.key(0), x)["params"]
    base = graft_pretrained_vit(base_fresh, convert_timm_vit(state, CFG))
    lora_fresh = ViT(cfg_lora).init(jax.random.key(1), x)["params"]
    # block-group layout follows each model's own lora_start_block
    lora = graft_pretrained_vit(lora_fresh, convert_timm_vit(state, cfg_lora))

    out_base = np.asarray(ViT(CFG).apply({"params": base}, x)["tokens"])
    out_lora = np.asarray(ViT(cfg_lora).apply({"params": lora}, x)["tokens"])
    np.testing.assert_allclose(out_lora, out_base, atol=1e-6)
