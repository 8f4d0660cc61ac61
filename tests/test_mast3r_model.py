"""MASt3R flax stack: torch block-level parity + tiny end-to-end smoke."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gd3d.models.croco import (
    CrocoConfig,
    CrocoDecoderBlock,
    CrocoEncoderBlock,
)
from gd3d.models.mast3r import Mast3r, Mast3rConfig, pixel_shuffle_nhwc
from gd3d.ops.rope2d import grid_positions
from gd3d.teachers.mast3r import _decoder_block, _enc_block, _conv_transpose

TINY = CrocoConfig(
    patch_size=16,
    enc_embed_dim=32,
    enc_depth=2,
    enc_num_heads=2,
    dec_embed_dim=16,
    dec_depth=2,
    dec_num_heads=2,
)


# ---- torch transcriptions (dust3r/croco/models/blocks.py) ----------------
class TRoPE2D(nn.Module):
    def __init__(self, freq=100.0):
        super().__init__()
        self.base = freq

    def get_cos_sin(self, D, seq_len, dtype):
        inv_freq = 1.0 / (self.base ** (torch.arange(0, D, 2).float() / D))
        t = torch.arange(seq_len, dtype=inv_freq.dtype)
        freqs = torch.einsum("i,j->ij", t, inv_freq).to(dtype)
        freqs = torch.cat((freqs, freqs), dim=-1)
        return freqs.cos(), freqs.sin()

    @staticmethod
    def rotate_half(x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def apply_rope1d(self, tokens, pos1d, cos, sin):
        cos = F.embedding(pos1d, cos)[:, None, :, :]
        sin = F.embedding(pos1d, sin)[:, None, :, :]
        return (tokens * cos) + (self.rotate_half(tokens) * sin)

    def forward(self, tokens, positions):
        D = tokens.size(3) // 2
        cos, sin = self.get_cos_sin(D, int(positions.max()) + 1, tokens.dtype)
        y, x = tokens.chunk(2, dim=-1)
        y = self.apply_rope1d(y, positions[:, :, 0], cos, sin)
        x = self.apply_rope1d(x, positions[:, :, 1], cos, sin)
        return torch.cat((y, x), dim=-1)


class TAttention(nn.Module):
    def __init__(self, dim, rope, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, x, xpos):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads).transpose(1, 3)
        q, k, v = [qkv[:, :, i] for i in range(3)]
        q = self.rope(q, xpos)
        k = self.rope(k, xpos)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TCrossAttention(nn.Module):
    def __init__(self, dim, rope, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.projq = nn.Linear(dim, dim, bias=True)
        self.projk = nn.Linear(dim, dim, bias=True)
        self.projv = nn.Linear(dim, dim, bias=True)
        self.proj = nn.Linear(dim, dim)
        self.rope = rope

    def forward(self, query, key, value, qpos, kpos):
        B, Nq, C = query.shape
        Nk = key.shape[1]
        H = self.num_heads
        q = self.projq(query).reshape(B, Nq, H, C // H).permute(0, 2, 1, 3)
        k = self.projk(key).reshape(B, Nk, H, C // H).permute(0, 2, 1, 3)
        v = self.projv(value).reshape(B, Nk, H, C // H).permute(0, 2, 1, 3)
        q = self.rope(q, qpos)
        k = self.rope(k, kpos)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn_map = attn.clone().detach()
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, Nq, C)
        return self.proj(x), attn_map


class TMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TBlock(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(dim, rope, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, dim * 4)

    def forward(self, x, xpos):
        x = x + self.attn(self.norm1(x), xpos)
        x = x + self.mlp(self.norm2(x))
        return x


class TDecoderBlock(nn.Module):
    def __init__(self, dim, heads, rope):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(dim, rope, heads)
        self.cross_attn = TCrossAttention(dim, rope, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.norm3 = nn.LayerNorm(dim, eps=1e-6)
        self.norm_y = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim, dim * 4)

    def forward(self, x, y, xpos, ypos):
        x = x + self.attn(self.norm1(x), xpos)
        y_ = self.norm_y(y)
        x_tmp, attn_map = self.cross_attn(self.norm2(x), y_, y_, xpos, ypos)
        x = x + x_tmp
        x = x + self.mlp(self.norm3(x))
        return x, y, attn_map


def _state(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def test_encoder_block_matches_torch():
    torch.manual_seed(0)
    dim, heads = 32, 2
    rope = TRoPE2D()
    tblk = TBlock(dim, heads, rope).eval()
    pos = np.asarray(grid_positions(3, 4, 2)).astype(np.int64)
    x = np.random.RandomState(0).randn(2, 12, dim).astype(np.float32)
    with torch.no_grad():
        want = tblk(torch.from_numpy(x), torch.from_numpy(pos)).numpy()

    cfg = dataclasses.replace(TINY, enc_embed_dim=dim, enc_num_heads=heads)
    params = _enc_block({f"b.{k}": v for k, v in _state(tblk).items()}, "b")
    blk = CrocoEncoderBlock(cfg)
    got = np.asarray(
        blk.apply({"params": params}, jnp.asarray(x), jnp.asarray(pos))
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_decoder_block_matches_torch():
    torch.manual_seed(1)
    dim, heads = 16, 2
    rope = TRoPE2D()
    tblk = TDecoderBlock(dim, heads, rope).eval()
    pos = np.asarray(grid_positions(3, 4, 1)).astype(np.int64)
    x = np.random.RandomState(1).randn(1, 12, dim).astype(np.float32)
    y = np.random.RandomState(2).randn(1, 12, dim).astype(np.float32)
    with torch.no_grad():
        want_x, _, want_map = tblk(
            torch.from_numpy(x), torch.from_numpy(y),
            torch.from_numpy(pos), torch.from_numpy(pos),
        )
    cfg = dataclasses.replace(TINY, dec_embed_dim=dim, dec_num_heads=heads)
    params = _decoder_block({f"b.{k}": v for k, v in _state(tblk).items()}, "b")
    blk = CrocoDecoderBlock(cfg)
    got_x, got_map = blk.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(pos), jnp.asarray(pos),
    )
    np.testing.assert_allclose(np.asarray(got_x), want_x.numpy(), rtol=2e-4, atol=2e-5)
    # our export is head-meaned; mean the torch map
    np.testing.assert_allclose(
        np.asarray(got_map), want_map.mean(1).numpy(), rtol=2e-4, atol=2e-5
    )


def test_conv_transpose_conversion():
    torch.manual_seed(2)
    tconv = nn.ConvTranspose2d(3, 5, 4, stride=4).eval()
    x = np.random.RandomState(3).randn(1, 3, 6, 7).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
    import flax.linen as fnn

    params = _conv_transpose({f"c.{k}": v for k, v in _state(tconv).items()}, "c")
    conv = fnn.ConvTranspose(5, (4, 4), strides=(4, 4), padding="VALID")
    got = np.asarray(
        conv.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_matches_torch():
    x = np.random.RandomState(4).randn(2, 12, 3, 4).astype(np.float32)  # NCHW
    want = F.pixel_shuffle(torch.from_numpy(x), 2).permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        pixel_shuffle_nhwc(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_mast3r_tiny_end_to_end():
    cfg = Mast3rConfig(croco=TINY, local_feat_dim=6, dpt_feature_dim=32,
                       dpt_last_dim=16)
    model = Mast3r(cfg)
    H, W = 64, 96
    img1 = jnp.asarray(np.random.RandomState(5).rand(1, H, W, 3) * 2 - 1, jnp.float32)
    img2 = jnp.asarray(np.random.RandomState(6).rand(1, H, W, 3) * 2 - 1, jnp.float32)
    params = model.init(jax.random.key(0), img1, img2)["params"]
    out = model.apply({"params": params}, img1, img2, 0.7)
    res1, res2 = out["res1"], out["res2"]
    N = (H // 16) * (W // 16)
    assert res1["pts3d"].shape == (2, H, W, 3)
    assert res1["desc"].shape == (2, H, W, 6)
    assert res2["tgt_attn_map"].shape == (2, N, N)
    assert res2["pts3d_in_other_view"].shape == (2, H, W, 3)
    # conf >= vmin (exp mode)
    assert float(res1["conf"].min()) >= 1.0
    assert float(res1["desc_conf"].min()) >= 0.0
    # attn rows ~ sum to 1 except the column-0 min hack perturbation
    rowsums = np.asarray(res2["tgt_attn_map"].sum(-1))
    assert np.all(np.abs(rowsums - 1.0) < 0.2)
    # descs unit-norm
    norms = np.linalg.norm(np.asarray(res1["desc"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)
