"""VGGT transformer layers: DINOv2-style blocks with LayerScale/qk-norm and
the forked cross-frame attention export.

Parity targets: vggt/layers/attention.py (incl. the fork's
custom_scaled_dot_product_attention cross-frame blocks :51-85),
vggt/layers/block.py:81-130, vggt/layers/rope.py (same math as CroCo RoPE2D
but float positions), vggt/layers/mlp.py, vggt/layers/layer_scale.py.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from gd3d.ops.attention import scaled_dot_attention
from gd3d.ops.rope2d import rope2d


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma


class VggtMlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="fc2")(x)


class VggtAttention(nn.Module):
    """Attention with optional qk-norm, RoPE, and cross-frame map export.

    The export (return_attn) reproduces attention.py:51-85: scores between
    frame-1 patch queries (tokens 5:N/2) and frame-2 patch keys (N/2+5:) and
    vice versa, softmaxed at `temperature`, concatenated on the batch axis,
    then head-meaned here (every consumer immediately head-means,
    src/finetune_timm_vggt.py:390-392).
    """

    dim: int
    num_heads: int
    qk_norm: bool = False
    use_rope: bool = False
    rope_freq: float = 100.0
    eps: float = 1e-6
    special_tokens: int = 5
    # sequence/context parallelism: when a mesh is set, attention runs
    # ring-passed-KV sharded on the token axis over `sp_axis` (the CP story
    # for the S*P global-attention axis, SURVEY.md §2.4/§5). sp_batch_axis
    # optionally keeps B sharded over an orthogonal mesh axis (DP x SP).
    sp_mesh: Optional[object] = None
    sp_axis: str = "data"
    sp_batch_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos=None, return_attn: bool = False, temperature=1.0):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, use_bias=True, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        if self.qk_norm:
            q = nn.LayerNorm(epsilon=self.eps, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=self.eps, name="k_norm")(k)
        if self.use_rope and pos is not None:
            q = rope2d(
                q.transpose(0, 2, 1, 3), pos, self.rope_freq
            ).transpose(0, 2, 1, 3)
            k = rope2d(
                k.transpose(0, 2, 1, 3), pos, self.rope_freq
            ).transpose(0, 2, 1, 3)

        scale = D**-0.5
        if self.sp_mesh is not None:
            from gd3d.parallel.sequence import ring_attention

            out = ring_attention(
                q, k, v, self.sp_mesh, self.sp_axis, scale,
                batch_axis=self.sp_batch_axis,
            ).reshape(B, N, C)
        else:
            out = scaled_dot_attention(q, k, v, scale=scale).reshape(B, N, C)
        out = nn.Dense(C, use_bias=True, name="proj")(out)

        attn_export = None
        if return_attn:
            s = self.special_tokens
            half = N // 2
            qh = (q * scale).transpose(0, 2, 1, 3)  # (B, H, N, D)
            kh = k.transpose(0, 2, 1, 3)
            q1 = qh[:, :, s:half]
            k2 = kh[:, :, half + s :]
            q2 = qh[:, :, half + s :]
            k1 = kh[:, :, s:half]
            s1 = jnp.einsum("bhnd,bhmd->bhnm", q1, k2)
            s2 = jnp.einsum("bhnd,bhmd->bhnm", q2, k1)
            a1 = jax.nn.softmax(s1 / temperature, axis=-1)
            a2 = jax.nn.softmax(s2 / temperature, axis=-1)
            # cat on batch (attention.py:85), head-mean fused
            attn_export = jax.lax.stop_gradient(
                jnp.concatenate([a1.mean(1), a2.mean(1)], axis=0)
            )
        return out, attn_export


class VggtBlock(nn.Module):
    """Pre-norm block with LayerScale (block.py:81-130).

    With scanned=True the call follows the nn.scan protocol:
    (carry x) -> (x, attn_map_or_None)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    init_values: Optional[float] = None
    qk_norm: bool = False
    use_rope: bool = False
    rope_freq: float = 100.0
    eps: float = 1e-6
    scanned: bool = False
    sp_mesh: Optional[object] = None
    sp_axis: str = "data"
    sp_batch_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos=None, return_attn: bool = False, temperature=1.0):
        h = nn.LayerNorm(epsilon=self.eps, name="norm1")(x)
        a, attn_map = VggtAttention(
            self.dim, self.num_heads, qk_norm=self.qk_norm,
            use_rope=self.use_rope, rope_freq=self.rope_freq, eps=self.eps,
            sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
            sp_batch_axis=self.sp_batch_axis,
            name="attn",
        )(h, pos=pos, return_attn=return_attn, temperature=temperature)
        if self.init_values is not None:
            a = LayerScale(self.dim, self.init_values, name="ls1")(a)
        x = x + a
        h = nn.LayerNorm(epsilon=self.eps, name="norm2")(x)
        m = VggtMlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(h)
        if self.init_values is not None:
            m = LayerScale(self.dim, self.init_values, name="ls2")(m)
        x = x + m
        return x, attn_map  # (carry, ys) under nn.scan; plain tuple otherwise
