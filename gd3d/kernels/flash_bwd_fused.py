"""Fused flash-attention backward: dq + dk + dv in ONE pallas pass.

The stock pallas flash backward (jax.experimental.pallas.ops.tpu.
flash_attention) runs two kernels — dkv (grid kv-major, 4 matmuls/tile:
recomputed QK^T, dP, dV, dK) and dq (grid q-major, 3 matmuls/tile:
recomputed QK^T, dP, dQ). The attention matrix P and its gradient dP are
therefore recomputed twice: 7 tile-matmuls where 5 suffice. On the
flagship student shapes (B=2, H=12, N=4608, D=64, 768-token blocks) the
split backward measures 43 ms/step (21% of the whole distillation step,
device trace round 5).

This kernel runs the dkv grid (B, H, KV, Q) and additionally emits
per-KV-block partial dQ tiles (dq_partial[b, h, kv, q_block] = dS @ K),
which the host sums over the small KV axis — one extra [B, H, KV_steps,
N, D] f32 store+reduce (~0.5 ms/layer of HBM traffic) in exchange for
dropping two of the seven tile-matmuls (~1.5 ms/layer).

Scope: non-causal, no attention bias (ab) — all gd3d models. Segment ids
(padding masks) supported. dK/dV math mirrors the stock dkv kernel
exactly (same casts, same accumulation order); dQ differs from the stock
dq kernel only in f32 partial-sum order (tree reduce of KV_steps partials
vs sequential scratch accumulation) — ~1e-7-level, covered by the
flash-vs-einsum parity tests.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_LANES = 128
NUM_SUBLANES = 8
MIN_BLOCK_SIZE = 128
TRANS_B_DIM_NUMBERS = (((1,), (1,)), ((), ()))
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.dtype("float32")).max)


def _fused_bwd_kernel(
    q_tile_ref,
    k_tile_ref,
    v_tile_ref,
    q_segment_ids_tile_ref,
    kv_segment_ids_tile_ref,
    l_tile_ref,
    m_tile_ref,
    do_tile_ref,
    di_tile_ref,
    dk_tile_ref,
    dv_tile_ref,
    dq_partial_tile_ref,
    dk_scratch_ref,
    dv_scratch_ref,
    dq_scratch_ref,
    *,
    block_q: int,
    block_k: int,
    sm_scale: float,
    mask_value: float,
    q_seq_len: int,
):
    _, _, kv_index, q_index = (
        pl.program_id(0), pl.program_id(1), pl.program_id(2),
        pl.program_id(3))
    del kv_index
    block_q_major = q_tile_ref.shape[2]
    block_k_major = k_tile_ref.shape[2]

    @pl.when(q_index == 0)
    def start_new_kv_sequence():
        dk_scratch_ref[...] = jnp.zeros_like(dk_scratch_ref)
        dv_scratch_ref[...] = jnp.zeros_like(dv_scratch_ref)

    def q_body(j, _):
        start_q = j * block_q
        dq_scratch_ref[pl.ds(start_q, block_q), :] = jnp.zeros(
            (block_q, dq_scratch_ref.shape[1]), jnp.float32)

        def k_body(i, _):
            start_k = i * block_k
            k = k_tile_ref[0, 0, pl.ds(start_k, block_k), :]
            v = v_tile_ref[0, 0, pl.ds(start_k, block_k), :]
            q = q_tile_ref[0, 0, pl.ds(start_q, block_q), :]
            l = l_tile_ref[0, 0, pl.ds(start_q, block_q), :]
            m = m_tile_ref[0, 0, pl.ds(start_q, block_q), :]
            do = do_tile_ref[0, 0, pl.ds(start_q, block_q), :]
            di = di_tile_ref[0, 0, pl.ds(start_q, block_q), :].astype(
                jnp.float32)

            capped_logits = lax.dot_general(
                q, k, TRANS_B_DIM_NUMBERS,
                preferred_element_type=jnp.float32)
            if sm_scale != 1.0:
                capped_logits *= sm_scale

            if q_segment_ids_tile_ref is not None:
                repeats, rem = divmod(block_k, NUM_LANES)
                if rem:
                    raise NotImplementedError(
                        f"kv block size must be a multiple of {NUM_LANES}")
                q_segment_ids = jnp.tile(
                    q_segment_ids_tile_ref[0, pl.ds(start_q, block_q), :],
                    (1, repeats))
                kv_segment_ids = kv_segment_ids_tile_ref[
                    :, 0, pl.ds(start_k, block_k)]
                mask = jnp.equal(q_segment_ids, kv_segment_ids)
                capped_logits += jnp.where(mask, 0.0, mask_value)

            p = jnp.exp(
                capped_logits - jnp.tile(m, (1, block_k // MIN_BLOCK_SIZE)))
            p = p * jnp.tile(1 / l, (1, block_k // MIN_BLOCK_SIZE))

            dv = lax.dot(p.T.astype(do.dtype), do,
                         preferred_element_type=jnp.float32)
            dv_scratch_ref[pl.ds(start_k, block_k), :] += dv.astype(
                dv_scratch_ref.dtype)

            dp = lax.dot_general(
                do, v, TRANS_B_DIM_NUMBERS,
                preferred_element_type=jnp.float32)
            ds = (dp - jnp.tile(di, (1, block_k // MIN_BLOCK_SIZE))) * p
            if sm_scale != 1.0:
                ds = ds * sm_scale

            dk = lax.dot(ds.T.astype(do.dtype), q,
                         preferred_element_type=jnp.float32)
            dk_scratch_ref[pl.ds(start_k, block_k), :] += dk.astype(
                dk_scratch_ref.dtype)

            # the dq contribution of this kv block — the tile-matmul the
            # stock split backward pays a full P/dP recompute for
            dq_scratch_ref[pl.ds(start_q, block_q), :] += lax.dot(
                ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

        lax.fori_loop(0, block_k_major // block_k, k_body, None, unroll=True)
        dq_partial_tile_ref[0, 0, 0, pl.ds(start_q, block_q), :] = (
            dq_scratch_ref[pl.ds(start_q, block_q), :])

    lax.fori_loop(0, block_q_major // block_q, q_body, None, unroll=True)

    @pl.when(q_index == q_seq_len // block_q_major - 1)
    def end_of_kv_sequence():
        dv_tile_ref[0, 0, :, :] = dv_scratch_ref[...].astype(
            dv_tile_ref.dtype)
        dk_tile_ref[0, 0, :, :] = dk_scratch_ref[...].astype(
            dk_tile_ref.dtype)


def flash_attention_bwd_fused(
    q,
    k,
    v,
    segment_ids,
    l,
    m,
    do,
    di,
    *,
    block_q_major: int,
    block_q: int,
    block_k_major: int,
    block_k: int,
    sm_scale: float,
    mask_value: float = DEFAULT_MASK_VALUE,
    debug: bool = False,
    interpret: bool = False,
):
    """One-pass dq/dk/dv. Returns (dq, dk, dv); non-causal, no bias."""
    batch_size, num_heads, q_seq_len, head_dim = q.shape
    _, _, kv_seq_len, _ = k.shape
    assert q_seq_len % block_q_major == 0, (q_seq_len, block_q_major)
    assert kv_seq_len % block_k_major == 0, (kv_seq_len, block_k_major)
    n_kv = kv_seq_len // block_k_major

    m_in = jnp.broadcast_to(m[..., None], (*m.shape, MIN_BLOCK_SIZE))
    l_in = jnp.broadcast_to(l[..., None], (*l.shape, MIN_BLOCK_SIZE))
    di_in = jnp.broadcast_to(di[..., None], (*di.shape, MIN_BLOCK_SIZE))

    grid = (batch_size, num_heads, n_kv, q_seq_len // block_q_major)

    def qo_index_map(b, h, kv_idx, q_idx):
        del kv_idx
        return (b, h, q_idx, 0)

    qo_spec = pl.BlockSpec((1, 1, block_q_major, head_dim), qo_index_map)

    def kv_index_map(b, h, kv_idx, _):
        return (b, h, kv_idx, 0)

    kv_spec = pl.BlockSpec((1, 1, block_k_major, head_dim), kv_index_map)
    lm_spec = pl.BlockSpec((1, 1, block_q_major, MIN_BLOCK_SIZE),
                           qo_index_map)

    q_segment_ids_spec = kv_segment_ids_spec = None
    q_segment_ids = kv_segment_ids = None
    if segment_ids is not None:
        def q_seg_index_map(b, h, kv_idx, q_idx):
            del h, kv_idx
            return (b, q_idx, 0)

        def kv_seg_index_map(b, h, kv_idx, _):
            del h
            return (b, 0, kv_idx)

        q_segment_ids_spec = pl.BlockSpec(
            (1, block_q_major, NUM_LANES), q_seg_index_map)
        kv_segment_ids_spec = pl.BlockSpec(
            (1, NUM_SUBLANES, block_k_major), kv_seg_index_map)
        q_segment_ids = jax.lax.broadcast_in_dim(
            segment_ids.q, (batch_size, q_seq_len, NUM_LANES), (0, 1))
        kv_segment_ids = jax.lax.broadcast_in_dim(
            segment_ids.kv, (batch_size, NUM_SUBLANES, kv_seq_len), (0, 2))

    in_specs = [
        qo_spec, kv_spec, kv_spec,
        q_segment_ids_spec, kv_segment_ids_spec,
        lm_spec, lm_spec, qo_spec, lm_spec,
    ]

    def dkv_index_map(b, h, kv_idx, _):
        return (b, h, kv_idx, 0)

    dkv_spec = pl.BlockSpec((1, 1, block_k_major, head_dim), dkv_index_map)

    def dq_partial_index_map(b, h, kv_idx, q_idx):
        return (b, h, kv_idx, q_idx, 0)

    dq_partial_spec = pl.BlockSpec(
        (1, 1, 1, block_q_major, head_dim), dq_partial_index_map)
    out_shapes = [
        jax.ShapeDtypeStruct(
            (batch_size, num_heads, kv_seq_len, head_dim), k.dtype),
        jax.ShapeDtypeStruct(
            (batch_size, num_heads, kv_seq_len, head_dim), v.dtype),
        jax.ShapeDtypeStruct(
            (batch_size, num_heads, n_kv, q_seq_len, head_dim),
            jnp.float32),
    ]
    out_specs = [dkv_spec, dkv_spec, dq_partial_spec]
    scratch_shapes = [
        pltpu.VMEM((block_k_major, head_dim), jnp.float32),  # dk
        pltpu.VMEM((block_k_major, head_dim), jnp.float32),  # dv
        pltpu.VMEM((block_q_major, head_dim), jnp.float32),  # dq partial
    ]

    kernel = functools.partial(
        _fused_bwd_kernel,
        block_q=block_q,
        block_k=block_k,
        sm_scale=sm_scale,
        mask_value=mask_value,
        q_seq_len=q_seq_len,
    )
    name_scope = (
        f"gd3d_flash_bwd_fused_{block_q_major=}_{block_q=}_"
        f"{block_k_major=}_{block_k=}")
    with jax.named_scope(name_scope):
        dk, dv, dq_partial = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=in_specs,
                out_specs=out_specs,
                scratch_shapes=scratch_shapes,
            ),
            out_shape=out_shapes,
            debug=debug,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v, q_segment_ids, kv_segment_ids, l_in, m_in, do, di_in)
    dq = dq_partial.sum(axis=2).astype(q.dtype)
    return dq, dk, dv
