"""Fused masked-softmax + KL cost-volume kernel.

The distillation KL pipeline (src/finetune_timm_mast3r.py:521-539 +
utils/functions.py:402-422 + utils/losses.py:5-15) computes, per row of the
(HW x HW) student cost volume: zero the row if its patch is unmasked,
softmax, clamp, then KL against the row-normalized teacher map. XLA keeps
the full masked/softmaxed intermediates in HBM; this Pallas kernel streams
row blocks through VMEM and emits only the per-row KL — the SURVEY.md §5
fusion target for the dense cost volume.

Forward is the Pallas kernel; backward (w.r.t. the raw student cost only —
the teacher map is stop-gradient) is the analytic softmax-KL gradient with
the clamp gate, as custom_vjp.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLK = 128
NEG_BIG = -1e30


def _kl_kernel(p_ref, cost_ref, mask_ref, out_ref, *, eps: float):
    p = p_ref[:]            # (B, RB, M) teacher, rows already normalized
    cost = cost_ref[:]      # (B, RB, M) raw student sims (padded cols NEG_BIG)
    mask = mask_ref[:]      # (B, RB, 1) float row mask

    masked = jnp.where(mask > 0, cost, jnp.where(cost <= NEG_BIG / 2, cost, 0.0))
    m = jnp.max(masked, axis=-1, keepdims=True)
    e = jnp.exp(masked - m)
    q = e / jnp.sum(e, axis=-1, keepdims=True)

    pc = jnp.maximum(p, eps)
    qc = jnp.maximum(q, eps)
    out_ref[:] = jnp.sum(pc * jnp.log(pc / qc), axis=-1)


def _fwd_impl(teacher_p, student_cost, row_mask, eps, interpret):
    B, N, M = student_cost.shape
    pad_n = (-N) % ROW_BLK
    pad_m = (-M) % 128
    p = jnp.pad(teacher_p, ((0, 0), (0, pad_n), (0, pad_m)))
    c = jnp.pad(
        student_cost, ((0, 0), (0, pad_n), (0, pad_m)),
        constant_values=NEG_BIG,
    )
    mask = jnp.pad(row_mask.astype(jnp.float32), ((0, 0), (0, pad_n)))[..., None]
    Np, Mp = N + pad_n, M + pad_m

    # Batch lives INSIDE the block (B is small: pairs per chip) so the
    # output block's trailing dims (B, ROW_BLK) match the array dims — the
    # TPU tiling rule requires the last two block dims be (8k, 128k) or
    # equal to the array's.
    out = pl.pallas_call(
        functools.partial(_kl_kernel, eps=eps),
        grid=(Np // ROW_BLK,),
        in_specs=[
            pl.BlockSpec((B, ROW_BLK, Mp), lambda n: (0, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ROW_BLK, Mp), lambda n: (0, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, ROW_BLK, 1), lambda n: (0, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, ROW_BLK), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np), jnp.float32),
        interpret=interpret,
    )(p, c, mask)
    return out[:, :N]


def _reference_rows(teacher_p, student_cost, row_mask, eps):
    """Pure-jnp reference of the same per-row KL (for CPU + parity tests)."""
    masked = jnp.where(row_mask[..., None], student_cost, 0.0)
    q = jax.nn.softmax(masked.astype(jnp.float32), axis=-1)
    pc = jnp.maximum(teacher_p, eps)
    qc = jnp.maximum(q, eps)
    return jnp.sum(pc * jnp.log(pc / qc), axis=-1)


# batch-parallel partitioning so the DP multichip program shards the kernel
# per-chip instead of failing Mosaic auto-partitioning (the batch dim is the
# only sharded dim; rows/cols are per-pair token grids)
from gd3d.parallel.pallas_partition import batch_partition

_fwd_impl_cp = batch_partition(
    _fwd_impl, rank_by_arg=(1, 1, 1), out_ranks=(1,),
    rule="b n m, b n m, b n -> b n", need_repl=("n", "m"), n_static=2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _masked_softmax_kl_rows_f32(teacher_p, student_cost, row_mask,
                                eps: float = 1e-8, interpret: bool = False):
    import os

    if os.environ.get("GD3D_FORCE_XLA_KERNELS") == "1":
        # deviceless AOT compiles can't emit custom_partitioning python
        # callbacks — dryrun_multichip_aot sets this to validate the full
        # program with the XLA path (same math, test_cost_kl_kernel.py)
        return _reference_rows(teacher_p, student_cost, row_mask, eps)
    if interpret or jax.default_backend() == "tpu":
        return _fwd_impl_cp(teacher_p, student_cost, row_mask, eps, interpret)
    return _reference_rows(teacher_p, student_cost, row_mask, eps)


def masked_softmax_kl_rows(teacher_p, student_cost, row_mask,
                           eps: float = 1e-8, interpret: bool = False):
    """Per-row KL(teacher || masked-softmax(student)) -> (B, N).

    teacher_p (B, N, M) row-normalized (stop-gradient), student_cost (B, N, M)
    raw similarities, row_mask (B, N) bool. mean() of the result equals
    kl_divergence_map(masked_patch_cost(teacher...), masked_patch_cost(
    student..., use_softmax=True)).

    Inputs are upcast to fp32 (differentiably) before the kernel: the loss
    is always-fp32 by policy (torch autocast also runs softmax/KL in fp32),
    and mosaic cannot lower bf16 compares on this target anyway.
    """
    return _masked_softmax_kl_rows_f32(
        teacher_p.astype(jnp.float32), student_cost.astype(jnp.float32),
        row_mask, eps, interpret)


def _vjp_fwd(teacher_p, student_cost, row_mask, eps, interpret):
    out = _masked_softmax_kl_rows_f32(teacher_p, student_cost, row_mask, eps,
                                      interpret)
    return out, (teacher_p, student_cost, row_mask)


def _vjp_bwd(eps, interpret, res, g):
    teacher_p, student_cost, row_mask = res
    masked = jnp.where(row_mask[..., None], student_cost, 0.0)
    q = jax.nn.softmax(masked.astype(jnp.float32), axis=-1)
    pc = jnp.maximum(teacher_p, eps)
    # d/dq of -pc*log(max(q, eps)): clamp gates the gradient
    u = jnp.where(q > eps, -pc / jnp.maximum(q, eps), 0.0)
    u = u * g[..., None]
    dmasked = q * (u - jnp.sum(u * q, axis=-1, keepdims=True))
    dcost = jnp.where(row_mask[..., None], dmasked, 0.0)
    return (None, dcost.astype(student_cost.dtype), None)


_masked_softmax_kl_rows_f32.defvjp(_vjp_fwd, _vjp_bwd)
