"""Flax ViT-B/16 student backbone with in-graph LoRA + bottleneck adapters.

Behavioral parity target: the timm `vit_base_patch16_clip_384` student as
mutated by the reference —
  - LoRA rank-r on the q and v slices of qkv for blocks[start:]
    (utils/model.py:27-71, src/finetune_timm_mast3r.py:118-141)
  - serial bottleneck Adapter wrapped around the same blocks
    (utils/model.py:7-25, BlockWithAdapter at :17-25)
  - `dynamic_img_size=True`: absolute pos-embed bicubically resampled to the
    input grid; prefix (cls) token excluded from resampling
  - `_intermediate_layers(n)` returns raw block outputs, normalized by the
    caller (src/finetune_timm_mast3r.py:262-268)

TPU-first: NHWC layout, fp32 by default, everything static-shaped; the patch
stride is an argument (the tracking eval overrides stride to patch//2,
src/evaluate_timm.py:261-269) and each distinct stride is its own XLA
compilation.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gd3d.core.config import StudentConfig
from gd3d.ops.attention import scaled_dot_attention


def torch_linear_init(fan_in: int):
    """torch nn.Linear/Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    (kaiming_uniform with a=sqrt(5), which the reference's reset_parameters
    also uses for the LoRA A matrices, finetune_timm_mast3r.py:166-170.)
    """
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _cubic_kernel(x: float, a: float = -0.75) -> float:
    """torch/OpenCV bicubic convolution kernel (a = -0.75)."""
    ax = abs(x)
    if ax <= 1.0:
        return (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0
    if ax < 2.0:
        return a * ax**3 - 5.0 * a * ax**2 + 8.0 * a * ax - 4.0 * a
    return 0.0


def _bicubic_resize_matrix(in_size: int, out_size: int, antialias: bool = False):
    """(out, in) interpolation matrix matching torch F.interpolate(bicubic,
    align_corners=False): half-pixel sampling, border taps replicated.
    With antialias=True and downscaling, the kernel is stretched by the scale
    factor and weights renormalized (torch's antialiased path). Built
    host-side with numpy — shapes are static."""
    import numpy as np

    W = np.zeros((out_size, in_size), np.float32)
    scale = in_size / out_size
    if antialias and scale > 1.0:
        # torch's upsample_bicubic2d_aa (the PIL-style separable filter):
        # cubic with a=-0.5, support stretched by scale, taps CLAMPED to
        # the valid range (no border replication) and renormalized.
        support = 2.0 * scale
        for o in range(out_size):
            center = scale * (o + 0.5)
            xmin = max(0, int(center - support + 0.5))
            xmax = min(in_size, int(center + support + 0.5))
            taps = range(xmin, xmax)
            ws = np.array([
                _cubic_kernel((t + 0.5 - center) / scale, a=-0.5)
                for t in taps
            ])
            s = ws.sum()
            if s > 0:
                ws = ws / s
            W[o, xmin:xmax] = ws
        return W
    for o in range(out_size):
        src = (o + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        for k, tap in enumerate(range(f - 1, f + 3)):
            w = _cubic_kernel(t - (tap - f))
            W[o, min(max(tap, 0), in_size - 1)] += w
    return W


def resample_pos_embed(
    pos_embed: jnp.ndarray,
    new_grid: Tuple[int, int],
    num_prefix_tokens: int = 1,
) -> jnp.ndarray:
    """Bicubic-resample the (1, P+prefix, C) pos embed to a new patch grid.

    Equivalent of timm's resample_abs_pos_embed / the reference's
    _fix_pos_enc (utils/functions.py:169-196): prefix tokens pass through,
    patch embeddings are treated as a square grid and resized with the exact
    torch bicubic kernel (a=-0.75, half-pixel, replicated borders).
    """
    prefix = pos_embed[:, :num_prefix_tokens]
    patch = pos_embed[:, num_prefix_tokens:]
    n = patch.shape[1]
    old = int(round(n**0.5))
    gh, gw = new_grid
    if (gh, gw) == (old, old):
        return pos_embed
    grid = patch.reshape(old, old, -1)
    Wh = jnp.asarray(_bicubic_resize_matrix(old, gh))
    Ww = jnp.asarray(_bicubic_resize_matrix(old, gw))
    grid = jnp.einsum("oi,ijc->ojc", Wh, grid)
    grid = jnp.einsum("oj,ijc->ioc", Ww, grid)
    return jnp.concatenate([prefix, grid.reshape(1, gh * gw, -1)], axis=1)


def layernorm_apply(ln_params: dict, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Functional LayerNorm with given {'scale','bias'} params."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * ln_params["scale"] + ln_params["bias"]


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)  # timm GELU is exact erf
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        return x


class Attention(nn.Module):
    """timm ViT attention with optional LoRA deltas on q and v.

    LoRA layout matches _LoRA_qkv (utils/model.py:27-71): qkv(x) then
    += B_q(A_q(x)) on the q third and += B_v(A_v(x)) on the v third.
    """

    dim: int
    num_heads: int
    lora_rank: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        qkv = nn.Dense(3 * self.dim, use_bias=True, dtype=self.dtype, name="qkv")(x)
        if self.lora_rank > 0:
            a_init = torch_linear_init(self.dim)
            a_q = nn.Dense(
                self.lora_rank, use_bias=False, kernel_init=a_init,
                dtype=self.dtype, name="lora_a_q",
            )(x)
            new_q = nn.Dense(
                self.dim, use_bias=False,
                kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="lora_b_q",
            )(a_q)
            a_v = nn.Dense(
                self.lora_rank, use_bias=False, kernel_init=a_init,
                dtype=self.dtype, name="lora_a_v",
            )(x)
            new_v = nn.Dense(
                self.dim, use_bias=False,
                kernel_init=nn.initializers.zeros, dtype=self.dtype,
                name="lora_b_v",
            )(a_v)
            qkv = qkv.at[..., : self.dim].add(new_q)
            qkv = qkv.at[..., 2 * self.dim :].add(new_v)

        head_dim = self.dim // self.num_heads
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)

        out = scaled_dot_attention(q, k, v, scale=head_dim**-0.5)
        out = out.reshape(B, N, C)
        return nn.Dense(self.dim, use_bias=True, dtype=self.dtype, name="proj")(out)


class Adapter(nn.Module):
    """Serial bottleneck adapter (utils/model.py:7-15): up(relu(down(x)))."""

    dim: int
    bottleneck: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(
            self.bottleneck, use_bias=False,
            kernel_init=torch_linear_init(self.dim), dtype=self.dtype,
            name="down",
        )(x)
        h = nn.relu(h)
        return nn.Dense(
            self.dim, use_bias=False,
            kernel_init=torch_linear_init(self.bottleneck), dtype=self.dtype,
            name="up",
        )(h)


class Block(nn.Module):
    cfg: StudentConfig
    lora: bool = False
    adapter: bool = False
    scanned: bool = False  # scan protocol: return (carry, per-layer output)

    @nn.compact
    def __call__(self, x, _scan_input=None):
        cfg = self.cfg
        # Mixed precision: matmuls/convs run at cfg.dtype (bf16 on the MXU
        # when compute_dtype="bfloat16"); LayerNorms and the residual stream
        # stay fp32 (pos-embed add promotes the stream to fp32, and every
        # residual add re-promotes the bf16 branch output).
        y = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm1")(x)
        x = x + Attention(
            cfg.embed_dim,
            cfg.num_heads,
            lora_rank=cfg.lora_rank if self.lora else 0,
            dtype=cfg.dtype,
            name="attn",
        )(y)
        y = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm2")(x)
        x = x + Mlp(
            cfg.embed_dim, int(cfg.embed_dim * cfg.mlp_ratio),
            dtype=cfg.dtype, name="mlp",
        )(y)
        if self.adapter:
            # BlockWithAdapter (utils/model.py:17-25): out + adapter(out)
            x = x + Adapter(
                cfg.embed_dim, cfg.adapter_bottleneck, dtype=cfg.dtype,
                name="adapter",
            )(x)
        if self.scanned:
            return x, x
        return x


class ViT(nn.Module):
    """ViT-B/16 trunk. Returns final tokens and/or raw intermediate outputs.

    __call__(imgs NHWC, already channel-normalized) -> dict with:
      'tokens':        (B, 1+P, C) after final LayerNorm (forward_features)
      'intermediates': tuple of raw block outputs for take_indices

    TPU-first: the two homogeneous block groups (plain blocks, then
    LoRA/adapter blocks) run as nn.scan with weight-stacked params — one
    traced block body each instead of `depth` inlined copies, shrinking the
    HLO (and XLA compile time) by ~an order of magnitude.
    """

    cfg: StudentConfig

    @nn.compact
    def __call__(
        self,
        imgs: jnp.ndarray,
        stride: Optional[int] = None,
        take_indices: Sequence[int] = (),
        final_tokens: bool = True,
    ):
        cfg = self.cfg
        ps = cfg.patch_size
        stride = stride or ps
        B, H, W, _ = imgs.shape

        x = nn.Conv(
            cfg.embed_dim,
            kernel_size=(ps, ps),
            strides=(stride, stride),
            padding="VALID",
            dtype=cfg.dtype,
            use_bias=not cfg.pre_norm,  # timm: `bias=not pre_norm`
            name="patch_embed",
        )(imgs)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, cfg.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, cfg.pos_grid * cfg.pos_grid + cfg.num_prefix_tokens, cfg.embed_dim),
        )
        pos = resample_pos_embed(pos_embed, (gh, gw), cfg.num_prefix_tokens)
        x = jnp.concatenate([jnp.tile(cls_token, (B, 1, 1)), x], axis=1)
        x = x + pos
        if cfg.pre_norm:
            # timm CLIP ViTs apply a pre-blocks LayerNorm after the
            # pos-embed add (VisionTransformer.norm_pre, pre_norm=True)
            x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm_pre")(x)
        if cfg.bf16_stream and cfg.dtype == jnp.bfloat16:
            # bf16 residual stream (torch-autocast semantics): LayerNorms
            # below still compute/emit fp32 (their params are fp32 and flax
            # promotes), only the carried stream and residual adds are bf16.
            x = x.astype(jnp.bfloat16)

        n_plain = min(cfg.lora_start_block, cfg.depth)
        n_adapt = cfg.depth - n_plain

        def scan_group(name, n_layers, lora, adapter, x):
            if n_layers == 0:
                return x, None
            body = nn.remat(Block) if cfg.remat else Block
            Scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=n_layers,
                in_axes=nn.broadcast,
                out_axes=0,
            )
            return Scanned(
                cfg, lora=lora, adapter=adapter, scanned=True, name=name
            )(x, None)

        x, ys_plain = scan_group("blocks_plain", n_plain, False, False, x)
        x, ys_adapt = scan_group(
            "blocks_adapt", n_adapt, True, cfg.use_adapters, x
        )

        intermediates = []
        if take_indices:
            parts = [p for p in (ys_plain, ys_adapt) if p is not None]
            all_layers = jnp.concatenate(parts, axis=0)  # (depth, B, N, C)
            for i in take_indices:
                intermediates.append(all_layers[int(i) % cfg.depth])

        out = {"intermediates": tuple(intermediates)}
        if final_tokens:
            out["tokens"] = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm")(x)
        return out


class DepthDiffHead(nn.Module):
    """DepthAwareFeatureFusion (utils/model.py:88-127).

    fusion: Dense(C->hidden) -> LayerNorm(eps 1e-5) -> GELU -> Dense(hidden->1),
    optional tanh. The depth_attention branch (depths provided) exists for
    parity but the training pipeline always calls the feature-only path
    (src/finetune_timm_mast3r.py:492, utils/losses.py:34).

    dtype: compute dtype for the Dense/GELU chain (LayerNorm promotes to
    fp32 as its params are fp32 — torch-autocast semantics). Matters for
    pairwise_score_diff, whose (B, N, N, hidden) intermediates are pure
    HBM traffic.
    """

    input_dim: int
    hidden_dim: int = 128
    use_tanh: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.depth_attn_fc1 = nn.Dense(
            self.hidden_dim,
            kernel_init=torch_linear_init(1),
            bias_init=torch_linear_init(1),
            dtype=self.dtype,
            name="depth_attn_fc1",
        )
        self.depth_attn_fc2 = nn.Dense(
            self.input_dim,
            kernel_init=torch_linear_init(self.hidden_dim),
            bias_init=torch_linear_init(self.hidden_dim),
            dtype=self.dtype,
            name="depth_attn_fc2",
        )
        self.fusion_in = nn.Dense(
            self.hidden_dim,
            kernel_init=torch_linear_init(self.input_dim),
            bias_init=torch_linear_init(self.input_dim),
            dtype=self.dtype,
            name="fusion_in",
        )
        self.fusion_ln = nn.LayerNorm(epsilon=1e-5, name="fusion_ln")
        self.fusion_out = nn.Dense(
            1,
            kernel_init=torch_linear_init(self.hidden_dim),
            bias_init=torch_linear_init(self.hidden_dim),
            dtype=self.dtype,
            name="fusion_out",
        )

    def _fusion_tail(self, h):
        h = self.fusion_ln(h)  # promotes to fp32 (torch autocast: LN is fp32)
        h = nn.gelu(h, approximate=False)
        # scores re-enter fp32 loss math regardless of compute dtype
        out = self.fusion_out(h)[..., 0].astype(jnp.float32)
        if self.use_tanh:
            out = jnp.tanh(out)
        return out

    def __call__(self, features, depths=None):
        if depths is not None:
            h = self.depth_attn_fc1(depths[..., None])
            h = nn.gelu(h, approximate=False)
            h = self.depth_attn_fc2(h)
            features = features * jax.nn.sigmoid(h)
        return self._fusion_tail(self.fusion_in(features))

    def pairwise_score_diff(self, features: jnp.ndarray) -> jnp.ndarray:
        """score[b, i, j] = head(features_j - features_i), memory-lean.

        The head's first Dense commutes with the subtraction, so project each
        point once and form pairwise differences in the hidden dim:
        W(f_j - f_i) + b = (W f_j + b) - (W f_i + b) + b. Exact.
        """
        u = self.fusion_in(features)  # (B, N, h)
        bias = self.fusion_in(jnp.zeros((1, features.shape[-1]), features.dtype))
        diff = u[:, None, :, :] - u[:, :, None, :] + bias[None]  # (B, N_i, N_j, h)
        return self._fusion_tail(diff)
