"""CroCo ViT encoder/decoder blocks with RoPE2D — the MASt3R trunk.

Parity targets:
  - blocks: dust3r/croco/models/blocks.py (Attention :82, CrossAttention
    :133 with the fork's pre-softmax attn-map export :150-172, Block :115,
    DecoderBlock :174-195, PatchEmbed :213)
  - assembly: dust3r/croco/models/croco.py:20-256 (RoPE100, enc 24x1024/16h,
    dec 12x768/12h for the ViT-L MASt3R checkpoint)

TPU-first: NHWC patchify, flash attention for self-attention (after RoPE),
explicit einsum only in the decoder cross-attention layers whose maps feed
the distillation cost volume. All LayerNorms eps 1e-6, GELU exact.
"""
from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from gd3d.ops.attention import scaled_dot_attention
from gd3d.ops.rope2d import grid_positions, rope2d


@dataclasses.dataclass(frozen=True)
class CrocoConfig:
    """ViT-L/16 encoder + Base decoder (MASt3R_ViTLarge_BaseDecoder_512)."""

    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: float = 4.0
    rope_base: float = 100.0
    layernorm_eps: float = 1e-6
    norm_im2_in_dec: bool = True


class CrocoMlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class RopeSelfAttention(nn.Module):
    """blocks.py:82-113: fused qkv, RoPE on q/k, softmax attention."""

    dim: int
    num_heads: int
    rope_base: float

    @nn.compact
    def __call__(self, x, pos):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)

        # rope expects (B, H, N, D)
        q = rope2d(q.transpose(0, 2, 1, 3), pos, self.rope_base).transpose(0, 2, 1, 3)
        k = rope2d(k.transpose(0, 2, 1, 3), pos, self.rope_base).transpose(0, 2, 1, 3)

        out = scaled_dot_attention(q, k, v, scale=D**-0.5).reshape(B, N, C)
        return nn.Dense(C, use_bias=True, name="proj")(out)


class RopeCrossAttention(nn.Module):
    """blocks.py:133-172 incl. the fork's detached pre-softmax map export."""

    dim: int
    num_heads: int
    rope_base: float

    @nn.compact
    def __call__(self, query, key, value, qpos, kpos, return_attn: bool = True):
        B, Nq, C = query.shape
        Nk = key.shape[1]
        H = self.num_heads
        D = C // H
        q = nn.Dense(C, use_bias=True, name="projq")(query).reshape(B, Nq, H, D)
        k = nn.Dense(C, use_bias=True, name="projk")(key).reshape(B, Nk, H, D)
        v = nn.Dense(C, use_bias=True, name="projv")(value).reshape(B, Nk, H, D)

        q = rope2d(q.transpose(0, 2, 1, 3), qpos, self.rope_base)
        k = rope2d(k.transpose(0, 2, 1, 3), kpos, self.rope_base)
        v = v.transpose(0, 2, 1, 3)

        scale = D**-0.5
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
        # head-mean pre-softmax map, detached (blocks.py:164; the fork keeps
        # per-head maps but every consumer immediately head-means them,
        # dust3r/dust3r/model.py:347-348 — we fuse the mean here to keep the
        # live buffer at (B, Nq, Nk) instead of (B, H, Nq, Nk))
        attn_map = jax.lax.stop_gradient(jnp.mean(attn, axis=1)) if return_attn else None
        probs = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bnhd", probs, v).reshape(B, Nq, C)
        out = nn.Dense(C, use_bias=True, name="proj")(out)
        return out, attn_map


class CrocoEncoderBlock(nn.Module):
    cfg: CrocoConfig
    scanned: bool = False
    collect: bool = False  # when scanned: also emit each block's output

    @nn.compact
    def __call__(self, x, pos):
        cfg = self.cfg
        y = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm1")(x)
        x = x + RopeSelfAttention(
            cfg.enc_embed_dim, cfg.enc_num_heads, cfg.rope_base, name="attn"
        )(y, pos)
        y = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm2")(x)
        x = x + CrocoMlp(
            cfg.enc_embed_dim, int(cfg.enc_embed_dim * cfg.mlp_ratio), name="mlp"
        )(y)
        if self.scanned:
            return x, (x if self.collect else None)
        return x


class CrocoDecoderBlock(nn.Module):
    """blocks.py:174-195: self-attn, cross-attn (map exported), MLP."""

    cfg: CrocoConfig

    @nn.compact
    def __call__(self, x, y, xpos, ypos, return_attn: bool = True):
        cfg = self.cfg
        C = cfg.dec_embed_dim
        h = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm1")(x)
        x = x + RopeSelfAttention(
            C, cfg.dec_num_heads, cfg.rope_base, name="attn"
        )(h, xpos)
        if cfg.norm_im2_in_dec:
            y_ = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm_y")(y)
        else:
            y_ = y
        h = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm2")(x)
        x_tmp, attn_map = RopeCrossAttention(
            C, cfg.dec_num_heads, cfg.rope_base, name="cross_attn"
        )(h, y_, y_, xpos, ypos, return_attn)
        x = x + x_tmp
        h = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm3")(x)
        x = x + CrocoMlp(C, int(C * cfg.mlp_ratio), name="mlp")(h)
        return x, attn_map


class CrocoDecoderPair(nn.Module):
    """One decoder layer for BOTH directions (dec_blocks / dec_blocks2,
    dust3r/dust3r/model.py:308-316), scan-able with weight stacking."""

    cfg: CrocoConfig
    collect_attn: bool = True

    @nn.compact
    def __call__(self, carry, pos1, pos2):
        g1, g2 = carry
        n1, m1 = CrocoDecoderBlock(self.cfg, name="blk1")(
            g1, g2, pos1, pos2, self.collect_attn
        )
        n2, m2 = CrocoDecoderBlock(self.cfg, name="blk2")(
            g2, g1, pos2, pos1, self.collect_attn
        )
        ys = (n1, n2, m1, m2) if self.collect_attn else (n1, n2)
        return (n1, n2), ys


class CrocoEncoder(nn.Module):
    """PatchEmbedDust3R conv + RoPE encoder stack + final norm.

    __call__(imgs NHWC in [-1, 1]) -> (tokens (B, N, C), positions (B, N, 2)).
    The 24 identical blocks run as one nn.scan with weight-stacked params
    (compile-time: one traced block instead of 24 inlined copies).

    collect_all=True additionally returns the stacked per-block outputs
    (L, B, N, C) UN-normed (croco.py:160-165 applies enc_norm only to the
    last element; downstream DPT hooks may tap earlier blocks) — the return
    becomes (normed_final, pos, all_blocks).
    """

    cfg: CrocoConfig
    collect_all: bool = False

    @nn.compact
    def __call__(self, imgs):
        cfg = self.cfg
        ps = cfg.patch_size
        B, H, W, _ = imgs.shape
        x = nn.Conv(
            cfg.enc_embed_dim, (ps, ps), strides=(ps, ps), padding="VALID",
            name="patch_embed",
        )(imgs)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, cfg.enc_embed_dim)
        pos = grid_positions(gh, gw, B)
        Scanned = nn.scan(
            CrocoEncoderBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.enc_depth,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        x, ys = Scanned(
            cfg, scanned=True, collect=self.collect_all, name="enc_blocks"
        )(x, pos)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="enc_norm")(x)
        if self.collect_all:
            return x, pos, ys
        return x, pos
