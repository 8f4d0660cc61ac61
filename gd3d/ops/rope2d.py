"""2D rotary position embedding (RoPE2D) — CroCo/DUSt3R flavor.

Parity targets: the cuRoPE2D CUDA kernel (the reference's ONLY native
component, dust3r/croco/models/curope/kernels.cu:17-82) and its torch
fallback (dust3r/croco/models/pos_embed.py:112-159): the head dim splits
into a y-half and an x-half; each half gets 1D RoPE at its integer grid
position with base freq 100. The CUDA kernel mutates tokens in-place and
implements backward as forward with F0 -> -F0; JAX is functional, so the
same trick becomes a custom_vjp (inverse rotation), keeping backward as
cheap as forward with zero residuals.

The cos/sin tables depend only on (positions, D); XLA hoists them out of the
layer loop — the functional analogue of the reference's per-(D, seq) cache.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rope1d(tokens: jnp.ndarray, pos1d: jnp.ndarray, base: float, F0: float):
    """Apply 1D RoPE. tokens (B, H, N, D), pos1d (B, N) int."""
    D = tokens.shape[-1]
    # inv_freq over even indices of D (pos_embed.py:121): length D/2.
    # F0 scales the ANGLE (kernels.cu:46: shared_inv_freq = fwd / base^...),
    # so F0 -> -F0 rotates by -theta: exactly the VJP of the rotation.
    inv_freq = F0 / (base ** (jnp.arange(0, D, 2, dtype=jnp.float32) / D))
    angles = pos1d[..., None].astype(jnp.float32) * inv_freq  # (B, N, D/2)
    angles = jnp.concatenate([angles, angles], axis=-1)  # (B, N, D)
    cos = jnp.cos(angles).astype(tokens.dtype)[:, None]  # (B, 1, N, D)
    sin = jnp.sin(angles).astype(tokens.dtype)[:, None]
    x1, x2 = jnp.split(tokens, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return tokens * cos + rot * sin


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rope2d_xla(tokens: jnp.ndarray, positions: jnp.ndarray,
               base: float = 100.0, F0: float = 1.0) -> jnp.ndarray:
    """Pure-jnp RoPE2D: tokens (B, H, N, D) with D % 4 == 0, positions
    (B, N, 2) as (y, x) integer grid coords. Returns rotated tokens."""
    return _rope2d_impl(tokens, positions, base, F0)


def _rope2d_impl(tokens, positions, base, F0):
    y, x = jnp.split(tokens, 2, axis=-1)
    y = _rope1d(y, positions[:, :, 0], base, F0)
    x = _rope1d(x, positions[:, :, 1], base, F0)
    return jnp.concatenate([y, x], axis=-1)


def _rope2d_fwd(tokens, positions, base, F0):
    return _rope2d_impl(tokens, positions, base, F0), positions


def _rope2d_bwd(base, F0, positions, g):
    # backward = forward with -F0 (curope2d.py:24-29): rotation by -theta
    # scaled by F0 — the transpose of the forward linear map.
    return _rope2d_impl(g, positions, base, -F0), None


rope2d_xla.defvjp(_rope2d_fwd, _rope2d_bwd)


import os

_USE_PALLAS = os.environ.get("GD3D_ROPE_PALLAS") == "1"


def rope2d(tokens: jnp.ndarray, positions: jnp.ndarray, base: float = 100.0,
           F0: float = 1.0) -> jnp.ndarray:
    """RoPE2D dispatch used by every model call site (croco, vggt layers).

    MEASURED DECISION (scripts/probe_rope2d.py on one v5e, CroCo ViT-L
    encoder shapes, 24-layer scan): the XLA path runs 2.3 ms vs the Pallas
    kernel's 24.1 ms — RoPE is a tiny elementwise rotation that XLA fuses
    into the surrounding qkv ops for free, while a standalone kernel pays
    launch overhead and an extra HBM round-trip per call. The jnp path is
    therefore the production default; the Pallas kernel (gd3d/kernels/
    rope2d.py, the cuRoPE2D analogue) stays available for kernel-dev via
    GD3D_ROPE_PALLAS=1 and is parity-tested both compiled-on-chip (the
    probe asserts exact equality) and in interpret mode (test_rope2d.py).
    """
    if _USE_PALLAS and jax.default_backend() == "tpu":
        from gd3d.kernels.rope2d import rope2d_pallas

        return rope2d_pallas(tokens, positions, base, F0)
    return rope2d_xla(tokens, positions, base, F0)


def grid_positions(h: int, w: int, batch: int = 1) -> jnp.ndarray:
    """(B, h*w, 2) integer (y, x) positions — PositionGetter
    (dust3r/croco/models/blocks.py:200-211)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    pos = jnp.stack([ys, xs], axis=-1).reshape(1, h * w, 2)
    return jnp.broadcast_to(pos, (batch, h * w, 2))
