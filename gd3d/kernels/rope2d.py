"""Pallas TPU kernel for RoPE2D — the cuRoPE2D replacement.

The reference's only native component is a CUDA kernel that rotates (B, N,
H, D) tokens in-place by per-position 2D angles
(dust3r/croco/models/curope/kernels.cu:17-82). TPU-native version: a Pallas
kernel over (batch*heads, token-block) grid computing angles in-register
from integer positions — cos/sin tables never touch HBM. Backward reuses the
forward with F0 -> -F0 (rotation transpose), like the CUDA autograd wrapper
(curope2d.py:12-29), via custom_vjp.

Used for D % 4 == 0 head dims (CroCo/DUSt3R use 64). The pure-jnp reference
implementation lives in gd3d.ops.rope2d; parity is tested in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLK = 256


def _rope2d_kernel(pos_ref, tok_ref, out_ref, *, base: float, F0: float, D: int):
    Q = D // 4
    toks = tok_ref[0]          # (N_BLK, D)
    pos = pos_ref[:]           # (N_BLK, 2) int32

    # mosaic requires integer iota; convert after
    k = jax.lax.broadcasted_iota(jnp.int32, (1, Q), 1).astype(jnp.float32)
    inv_freq = F0 / (base ** (k / Q))  # (1, Q); matches kernels.cu:46

    def rotate(u, v, p):
        ang = p[:, None].astype(jnp.float32) * inv_freq  # (N_BLK, Q)
        c = jnp.cos(ang).astype(toks.dtype)
        s = jnp.sin(ang).astype(toks.dtype)
        return u * c - v * s, v * c + u * s

    uy, vy = toks[:, 0:Q], toks[:, Q : 2 * Q]
    ux, vx = toks[:, 2 * Q : 3 * Q], toks[:, 3 * Q :]
    uy, vy = rotate(uy, vy, pos[:, 0])
    ux, vx = rotate(ux, vx, pos[:, 1])
    out_ref[0] = jnp.concatenate([uy, vy, ux, vx], axis=-1)


def _rope2d_call(tokens, positions, base, F0, interpret):
    """tokens (BH, N, D), positions (N, 2) int32."""
    BH, N, D = tokens.shape
    assert D % 4 == 0, "head dim must be a multiple of 4"
    pad = (-N) % N_BLK
    if pad:
        tokens = jnp.pad(tokens, ((0, 0), (0, pad), (0, 0)))
        positions = jnp.pad(positions, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // N_BLK

    out = pl.pallas_call(
        functools.partial(_rope2d_kernel, base=base, F0=F0, D=D),
        grid=(BH, n_blocks),
        in_specs=[
            pl.BlockSpec((N_BLK, 2), lambda b, n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N_BLK, D), lambda b, n: (b, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_BLK, D), lambda b, n: (b, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(tokens.shape, tokens.dtype),
        interpret=interpret,
    )(positions, tokens)
    if pad:
        out = out[:, :N]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def rope2d_pallas(tokens, positions, base: float = 100.0, F0: float = 1.0,
                  interpret: bool = False):
    """RoPE2D via Pallas. tokens (B, H, N, D); positions (B, N, 2) (y, x).

    positions are assumed identical across the batch (true for the
    grid-positions used by CroCo/DUSt3R); only positions[0] is read.
    """
    return _fwd_impl(tokens, positions, base, F0, interpret)


def _fwd_impl(tokens, positions, base, F0, interpret):
    B, H, N, D = tokens.shape
    flat = tokens.reshape(B * H, N, D)
    out = _rope2d_call(flat, positions[0].astype(jnp.int32), base, F0, interpret)
    return out.reshape(B, H, N, D)


def _fwd(tokens, positions, base, F0, interpret):
    return _fwd_impl(tokens, positions, base, F0, interpret), positions


def _bwd(base, F0, interpret, positions, g):
    return _fwd_impl(g, positions, base, -F0, interpret), None


rope2d_pallas.defvjp(_fwd, _bwd)
