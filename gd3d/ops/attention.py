"""Scaled-dot-product attention dispatch: Pallas flash attention on TPU,
einsum fallback elsewhere.

The student/teacher transformers never materialize the T^2 attention map on
the hot path (HBM-bandwidth bound at 6400 tokens); layers that must EXPORT
attention maps (the teachers' cost-volume taps) use the explicit einsum path
on those layers only.

Layout convention: q, k, v are (B, N, H, D) (token-major, matching how the
models unpack qkv); flash kernels want (B, H, N, D) and sequence lengths in
multiples of 128, handled here by transpose + segment-id padding.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _einsum_sdpa(q, k, v, scale):
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


_BLOCK = 512  # measured on v5e: 512-blocks run ~3.8x faster than defaults
# 768-token blocks measure faster still whenever the padded length divides:
# -5% at the student's (B=2, N=4608) fwd+bwd and -22% at B=4, where the
# 512-block backward tilings degrade (scripts/probe_attention.py). Padding
# targets the smaller of the next 512- or 768-multiple (_pad_target).
_BLOCK_PREF = 768


def _pick_block(n: int) -> int:
    return _BLOCK_PREF if n % _BLOCK_PREF == 0 else _BLOCK


def _pad_target(n: int) -> int:
    """Smallest padded length that admits a legal block tiling.

    Padding granularity used to be 512 only, which inflates the teacher's
    672-token sequences (21x32 grid) to 1024 — 52% wasted attention FLOPs
    across all 24 encoder + 12 decoder layers. A 768 pad is a legal
    768-block tiling and strictly less work; pick whichever multiple of
    512 or 768 pads less (ties -> 768-blocks, measured faster)."""
    to512 = -(-n // _BLOCK) * _BLOCK
    to768 = -(-n // _BLOCK_PREF) * _BLOCK_PREF
    return min(to512, to768)


# Measured pad/tiling plans (scripts/probe_pad_block.py, v5e, round 5):
# real length -> (pad, fwd (bq, bk_major, bk), bwd (bqM, bq, bkM, bk)).
# Any 128-multiple is a legal pad, not just 512/768-multiples — the
# flagship student's 1025 tokens (512^2 / patch 16 + cls) pad to 1536
# under the 512/768 rule (2.25x the useful QK/PV FLOPs) when 1152 =
# 384x3 tiles legally at +26%. Filled from the sweep; every entry beat
# the fallback rule on-chip.
_TILE_PLANS: dict = {
    # flagship student self-attn (B=2, H=12, D=64 fwd+bwd, 36-layer scan):
    # 1.24 ms/layer vs 1.69 at the old pad1536/768-blocks (-27%)
    1025: (1152, (1152, 1152, 384), (1152, 384, 1152, 384)),
    # MASt3R teacher encoder/decoder tokens (336x512 / patch 16; frozen ->
    # the bwd tuple never runs in the bench, kept legal): fwd inner 256
    # measured 2.34 vs 2.63 ms/layer (B=4, H=16, fwd-only). The student
    # COST pass is 673 (cls token) and keeps the fallback 768-inner,
    # which wins for fwd+bwd at this pad.
    672: (768, (768, 768, 256), (768, 768, 768, 768)),
    # VGGT aggregator frame attention (1369 patches + camera + 4 register;
    # frozen, fwd-only): single 1408-block, 1.31 vs 1.57 ms/layer (-17%)
    1374: (1408, (1408, 1408, 1408), (1408, 128, 1408, 128)),
    # VGGT aggregator global attention, S=2 frames (2 x 1374): whole-row
    # KV major + 1408 blocks, 1.73 vs 2.15 ms/layer (-20%)
    2748: (2816, (1408, 2816, 1408), (1408, 128, 1408, 128)),
}


def _fallback_plan(n: int):
    """Fallback when no measured plan exists: 512/768 pad + the largest
    measured-good major (1536-majors with 768-inner beat 768-majors by
    9.5% at N=4608 fwd+bwd — fewer grid steps and half the fused-bwd
    dq_partial traffic)."""
    pad = _pad_target(n)
    if pad % 1536 == 0:
        major = 1536
    elif pad % 768 == 0:
        major = 768
    else:
        major = min(512, pad)
    inner = 768 if major % 768 == 0 else major
    return pad, (major, major, inner), (major, inner, major, inner)


def _tile_plan(n: int, m: int):
    """(pad_n, pad_m, fwd_blocks, bwd_blocks) for a q-len n / kv-len m."""
    if n == m and n in _TILE_PLANS:
        return (_TILE_PLANS[n][0], _TILE_PLANS[n][0], _TILE_PLANS[n][1],
                _TILE_PLANS[n][2])
    pad_n, (bq, _, _), (bqM, bq_i, _, _) = _fallback_plan(n)
    pad_m, (_, bkM, bk), (_, _, bkM_b, bk_b) = _fallback_plan(m)
    return pad_n, pad_m, (bq, bkM, bk), (bqM, bq_i, bkM_b, bk_b)


_DI_PATCHED = False


def _patch_flash_dq_di_broadcast():
    """Fix an HBM-traffic bug in the stock pallas flash backward.

    ``_flash_attention_bwd_dq`` broadcasts the per-row ``di`` statistics to
    ``block_k_major`` lanes before the pallas_call, but its own BlockSpec
    only ever reads the first ``MIN_BLOCK_SIZE`` (128) lanes — the kernel
    re-tiles in-register (`jnp.tile(di, ...)`). At the student's shapes
    (B=2, H=12, N=4608, 768-token blocks) the wasted lanes materialize a
    340 MB f32 array per layer: the device trace shows the broadcast alone
    at ~4 ms/step plus the kernel reading 6x the needed di bytes. Patch:
    recompile the function with the broadcast at MIN_BLOCK_SIZE, which is
    bit-identical math (the extra lanes were never read). Disable with
    GD3D_FLASH_DI_PATCH=0; a changed upstream pattern leaves the stock
    function in place (loud stderr note), never a wrong one.
    """
    global _DI_PATCHED
    if _DI_PATCHED:
        return
    _DI_PATCHED = True
    import inspect
    import os
    import sys
    import textwrap

    if os.environ.get("GD3D_FLASH_DI_PATCH", "1") == "0":
        return
    import jax.experimental.pallas.ops.tpu.flash_attention as fa

    src = textwrap.dedent(inspect.getsource(fa._flash_attention_bwd_dq))
    needle = "di = jnp.broadcast_to(di[..., None], (*di.shape, block_k_major))"
    if needle not in src or getattr(
            fa._flash_attention_bwd_dq, "_gd3d_di_patched", False):
        if needle not in src:
            print("gd3d: flash bwd_dq di-broadcast pattern not found; "
                  "leaving the stock kernel wrapper unpatched",
                  file=sys.stderr)
        return
    src = src.replace(
        needle,
        "di = jnp.broadcast_to(di[..., None], (*di.shape, MIN_BLOCK_SIZE))")
    ns = dict(fa.__dict__)
    exec(compile(src, fa.__file__ + "#gd3d-di-patch", "exec"), ns)
    patched = ns["_flash_attention_bwd_dq"]
    patched._gd3d_di_patched = True
    fa._flash_attention_bwd_dq = patched


import functools


# ---- multichip partitioning for the flash kernels --------------------------
#
# Flash attention is embarrassingly parallel over batch and heads — exactly
# the two dims the flagship shards (batch over `data`, heads over `model`
# via the Megatron qkv split). Each kernel entry below is wrapped in
# custom_partitioning (see gd3d/parallel/pallas_partition.py) so the DP x TP
# multichip program re-emits the same pallas call per shard instead of
# failing GSPMD auto-partitioning.
from gd3d.parallel.pallas_partition import batch_partition


def _make_flash_cp(impl, rank_by_arg, out_ranks, rule, need_repl,
                   n_static=3):
    return batch_partition(impl, rank_by_arg, out_ranks, rule, need_repl,
                           n_static=n_static)


def _seg(qs, kvs):
    from jax.experimental.pallas.ops.tpu.flash_attention import SegmentIds

    return SegmentIds(q=qs, kv=kvs)


def _flash_call(save_residuals, q, k, v, segment_ids, scale, fwd_blocks):
    import jax.experimental.pallas.ops.tpu.flash_attention as fa

    bq, bk_major, bk = fwd_blocks
    return fa._flash_attention_impl(
        q, k, v, None, segment_ids, save_residuals, False, scale,
        1, bq, bk_major, bk, False)


def _bwd_call(q, k, v, segment_ids, l, m, do, di, scale, bwd_blocks):
    from gd3d.kernels.flash_bwd_fused import flash_attention_bwd_fused

    bqM, bq, bkM, bk = bwd_blocks
    return flash_attention_bwd_fused(
        q, k, v, segment_ids, l, m, do, di,
        block_q_major=bqM, block_q=bq, block_k_major=bkM, block_k=bk,
        sm_scale=scale)


_QKV = "b h n d, b h m d, b h m e"
_RES = "b h n e, b h n, b h n"
_GRADS = "b h n d, b h m d, b h m e"
_LMDODI = "b h n, b h n, b h n e, b h n"
# need_replication factors must be listed in first-appearance order of the
# rule (Shardy requires the special-factor indices sorted)
_NR = ("n", "d", "m", "e")

_FWD_NOSEG = _make_flash_cp(
    lambda q, k, v, scale, fwd_blocks:
        _flash_call(False, q, k, v, None, scale, fwd_blocks),
    (2, 2, 2), (2,), f"{_QKV} -> b h n e", _NR, n_static=2)
_FWD_SEG = _make_flash_cp(
    lambda q, k, v, qs, kvs, scale, fwd_blocks:
        _flash_call(False, q, k, v, _seg(qs, kvs), scale, fwd_blocks),
    (2, 2, 2, 1, 1), (2,), f"{_QKV}, b n, b m -> b h n e", _NR, n_static=2)
_FWDRES_NOSEG = _make_flash_cp(
    lambda q, k, v, scale, fwd_blocks:
        _flash_call(True, q, k, v, None, scale, fwd_blocks),
    (2, 2, 2), (2, 2, 2), f"{_QKV} -> {_RES}", _NR, n_static=2)
_FWDRES_SEG = _make_flash_cp(
    lambda q, k, v, qs, kvs, scale, fwd_blocks:
        _flash_call(True, q, k, v, _seg(qs, kvs), scale, fwd_blocks),
    (2, 2, 2, 1, 1), (2, 2, 2), f"{_QKV}, b n, b m -> {_RES}", _NR,
    n_static=2)
_BWD_NOSEG = _make_flash_cp(
    lambda q, k, v, l, m, do, di, scale, bwd_blocks:
        _bwd_call(q, k, v, None, l, m, do, di, scale, bwd_blocks),
    (2, 2, 2, 2, 2, 2, 2), (2, 2, 2),
    f"{_QKV}, {_LMDODI} -> {_GRADS}", _NR, n_static=2)
_BWD_SEG = _make_flash_cp(
    lambda q, k, v, qs, kvs, l, m, do, di, scale, bwd_blocks:
        _bwd_call(q, k, v, _seg(qs, kvs), l, m, do, di, scale, bwd_blocks),
    (2, 2, 2, 1, 1, 2, 2, 2, 2), (2, 2, 2),
    f"{_QKV}, b n, b m, {_LMDODI} -> {_GRADS}", _NR, n_static=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_bwd_flash(q, k, v, segment_ids, scale, fwd_blocks, bwd_blocks):
    """Flash attention with the gd3d ONE-PASS backward (dq+dk+dv fused;
    gd3d/kernels/flash_bwd_fused.py). Forward is the stock pallas kernel;
    the backward drops 2 of the stock split-backward's 7 tile-matmuls
    (the dq pass's P/dP recompute) — measured on the flagship step where
    the split backward was 21% of total time. q/k/v are (B, H, N, D);
    fwd_blocks = (bq, bk_major, bk), bwd_blocks = (bqM, bq, bkM, bk) from
    _tile_plan. Both directions are custom_partitioning-wrapped
    (batch/head-parallel) so the DP x TP multichip program partitions
    them per-shard."""
    if segment_ids is None:
        return _FWD_NOSEG(q, k, v, scale, fwd_blocks)
    return _FWD_SEG(q, k, v, segment_ids.q, segment_ids.kv, scale,
                    fwd_blocks)


def _fused_bwd_flash_fwd(q, k, v, segment_ids, scale, fwd_blocks,
                         bwd_blocks):
    if segment_ids is None:
        o, l, m = _FWDRES_NOSEG(q, k, v, scale, fwd_blocks)
    else:
        o, l, m = _FWDRES_SEG(q, k, v, segment_ids.q, segment_ids.kv,
                              scale, fwd_blocks)
    return o, (q, k, v, segment_ids, o, l, m)


def _fused_bwd_flash_bwd(scale, fwd_blocks, bwd_blocks, residuals, do):
    q, k, v, segment_ids, o, l, m = residuals
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    if segment_ids is None:
        dq, dk, dv = _BWD_NOSEG(q, k, v, l, m, do, di, scale, bwd_blocks)
    else:
        dq, dk, dv = _BWD_SEG(q, k, v, segment_ids.q, segment_ids.kv,
                              l, m, do, di, scale, bwd_blocks)
    return dq, dk, dv, None


_fused_bwd_flash.defvjp(_fused_bwd_flash_fwd, _fused_bwd_flash_bwd)


def _flash_sdpa(q, k, v, scale):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    _patch_flash_dq_di_broadcast()

    B, N, H, D = q.shape
    M = k.shape[1]
    padded_n, padded_m, fwd_blocks, bwd_blocks = _tile_plan(N, M)
    pad_n = padded_n - N
    pad_m = padded_m - M

    qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, N, D)
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    segment_ids = None
    if pad_n or pad_m:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, pad_n), (0, 0)))
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad_m), (0, 0)))
        q_seg = (jnp.arange(N + pad_n) < N).astype(jnp.int32)[None]
        kv_seg = (jnp.arange(M + pad_m) < M).astype(jnp.int32)[None]
        segment_ids = SegmentIds(
            q=jnp.broadcast_to(q_seg, (B, N + pad_n)),
            kv=jnp.broadcast_to(kv_seg, (B, M + pad_m)),
        )
    clamp = lambda blocks, ns: tuple(min(b, n) for b, n in zip(blocks, ns))
    fwd_blocks = clamp(fwd_blocks, (padded_n, padded_m, padded_m))
    bwd_blocks = clamp(bwd_blocks, (padded_n, padded_n, padded_m, padded_m))
    import os

    if os.environ.get("GD3D_FLASH_FUSED_BWD", "1") != "0":
        out = _fused_bwd_flash(qt, kt, vt, segment_ids, scale, fwd_blocks,
                               bwd_blocks)
    else:
        bq, bk = fwd_blocks[0], fwd_blocks[2]
        block_sizes = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bk,
            block_k_dkv=bk, block_q_dkv=bq,
            block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
        )
        out = flash_attention(
            qt, kt, vt, causal=False, sm_scale=scale,
            segment_ids=segment_ids, block_sizes=block_sizes,
        )
    if pad_n:
        out = out[:, :, :N]
    return jnp.transpose(out, (0, 2, 1, 3))


def _pack_heads(x):
    """(B, M, H, D) -> two (B, M, H/2, D) halves of the head axis."""
    B, M, H, D = x.shape
    xr = x.reshape(B, M, H // 2, 2, D)
    return xr[:, :, :, 0], xr[:, :, :, 1]


def _flash_sdpa_head_packed(q, k, v, scale):
    """Flash attention for head_dim 64 with PAIRS of heads packed into one
    128-lane virtual head.

    head_dim 64 half-fills the v5e MXU's 128-wide tiles, capping the stock
    kernel at ~18-19% MFU on the ViT-B student (PERF_NOTES). Packing builds,
    per head pair (h1, h2):

        q_cat = [[q_h1  0  ]      (2N, 128)   block-diagonal queries
                 [0    q_h2]]
        k_cat = [k_h1 | k_h2]     (M, 128)    concatenated keys
        v_cat = [v_h1 | v_h2]     (M, 128)

    so q_cat @ k_cat^T contracts over 128 lanes yet row n < N yields exactly
    q_h1 . k_h1 (the zero half annihilates k_h2) and row n >= N yields
    q_h2 . k_h2 — the QK matmul runs at FULL MXU utilization with the same
    FLOP count (2x fewer idle lanes), softmax rows stay per-head exact, and
    the stock kernel's backward differentiates through the pack/unpack
    reshapes for free. The P@V product computes a junk cross half that the
    unpack slices away (out[:N, :64] and out[N:, 64:]) — full-lane but
    doubled FLOPs, a wash vs the half-lane original. Net: the QK half of
    the kernel doubles its throughput.

    MEASURED A WASH on one v5e (scripts/probe_head_packing.py, round 3):
    stock 13.26 vs packed 13.06 ms/layer at the student's (B=2, N=4161)
    fwd+bwd, and slightly WORSE at 4608/6401 — the microbench confirms the
    MXU underfill (K=64 -> 128 doubles matmul throughput at equal time),
    but the flash kernel at these shapes is bound by its softmax/VPU work
    and the PV-side matmuls, where the packed junk half cancels the QK
    win. Kept opt-in (GD3D_FLASH_PACK=1), numerics bit-exact vs stock —
    same lesson as RoPE2D/pairwise-rank: kernels must beat XLA (here, the
    stock kernel) in MEASUREMENT, not in tile arithmetic.
    """
    B, N, H, D = q.shape
    M = k.shape[1]
    q1, q2 = _pack_heads(q)  # (B, N, H/2, D)
    k1, k2 = _pack_heads(k)
    v1, v2 = _pack_heads(v)
    z = jnp.zeros_like(q1)
    q_cat = jnp.concatenate(
        [
            jnp.concatenate([q1, z], axis=-1),
            jnp.concatenate([z, q2], axis=-1),
        ],
        axis=1,
    )  # (B, 2N, H/2, 2D)
    k_cat = jnp.concatenate([k1, k2], axis=-1)  # (B, M, H/2, 2D)
    v_cat = jnp.concatenate([v1, v2], axis=-1)
    out = _flash_sdpa(q_cat, k_cat, v_cat, scale)  # (B, 2N, H/2, 2D)
    o1 = out[:, :N, :, :D]
    o2 = out[:, N:, :, D:]
    return jnp.stack([o1, o2], axis=3).reshape(B, N, H, D)


# head-packing threshold: pack when head_dim underfills the 128-lane MXU
_PACK_HEAD_DIM = 64


def scaled_dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    force_xla: bool = False,
) -> jnp.ndarray:
    """(B, N, H, D) x (B, M, H, D) attention. Flash on TPU, einsum fallback.

    GD3D_FLASH_PACK=1 routes head_dim-64 inputs with an even head count to
    the head-packed variant (2 heads per 128-lane MXU tile) — measured a
    wash on v5e, see _flash_sdpa_head_packed."""
    import os

    if scale is None:
        scale = q.shape[-1] ** -0.5
    if (force_xla or jax.default_backend() != "tpu"
            or os.environ.get("GD3D_FORCE_XLA_KERNELS") == "1"):
        return _einsum_sdpa(q, k, v, scale)

    if (
        q.shape[-1] == _PACK_HEAD_DIM
        and q.shape[2] % 2 == 0
        and os.environ.get("GD3D_FLASH_PACK") == "1"
    ):
        return _flash_sdpa_head_packed(q, k, v, scale)
    return _flash_sdpa(q, k, v, scale)
