"""Fused pairwise depth-ranking loss kernel.

The intra-depth loss (utils/losses.py:18-41 + the DepthAwareFeatureFusion
head, utils/model.py:100-127) scores every keypoint pair:

    score[b,i,j] = tanh(w_out . gelu(LN(u[b,j] - u[b,i] + bias)) + b_out)
    loss         = masked_mean(log1p(exp(-sign(d_j - d_i) * score)))

XLA materializes the (B, N, N, hidden) diff/LN/gelu chain in HBM — pure
bandwidth (~0.5 GB per pass at the MASt3R step's N=672, h=128; measured
14.9 ms fwd+bwd on one v5e). This kernel streams (ROW x COL) tiles of the
pair matrix through VMEM: u is read once, only per-batch loss sums leave
the chip. Backward is two tile passes (one accumulates du over the i role,
one over the j role) plus parameter-gradient accumulators.

The jnp fallback (Student.pairwise_score_diff + pairwise_logistic_ranking_
loss) remains the reference implementation for CPU and parity tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW = 64
COL = 64
_SQRT2 = 1.4142135623730951
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf lowering; this polynomial is accurate to fp32
    round-off for the exact-GELU parity the head needs."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x / _SQRT2))


def _gelu_grad(x):
    return 0.5 * (1.0 + _erf(x / _SQRT2)) + x * _INV_SQRT_2PI * jnp.exp(
        -0.5 * x * x)


def _tile_score(ui, uj, bias, ln_s, ln_b, w_out, b_out, eps):
    """score tile (ROW, COL) + the intermediates backward needs.

    ui (ROW, h), uj (COL, h): fusion_in outputs for the i (row) and j (col)
    keypoints; diff[i, j] = uj[j] - ui[i] + bias.
    """
    diff = uj[None, :, :] - ui[:, None, :] + bias[None, None, :]
    mu = jnp.mean(diff, axis=-1, keepdims=True)
    var = jnp.mean((diff - mu) ** 2, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (diff - mu) * inv
    y = xhat * ln_s[None, None, :] + ln_b[None, None, :]
    g = _gelu(y)
    pre = jnp.sum(g * w_out[None, None, :], axis=-1) + b_out
    score = jnp.tanh(pre)
    return score, (diff, mu, inv, xhat, y, g, pre)


def _pair_terms(score, di, dj, vi, vj, thr):
    alpha = jnp.sign(dj[None, :] - di[:, None])
    pv = (jnp.abs(dj[None, :] - di[:, None]) > thr) & (
        vi[:, None] > 0) & (vj[None, :] > 0)
    pvf = pv.astype(score.dtype)
    z = -alpha * score
    loss = jnp.log1p(jnp.exp(z))
    # dloss/dscore = -alpha * sigmoid(z)
    dscore = -alpha * jax.nn.sigmoid(z) * pvf
    return loss * pvf, pvf, dscore


def _fwd_kernel(u_i, u_j, d_i, d_j, v_i, v_j, bias, ln_s, ln_b, w_out, b_out,
                loss_out, cnt_out, *, thr, eps):
    i = pl.program_id(1)
    j = pl.program_id(2)

    score, _ = _tile_score(
        u_i[0], u_j[0], bias[0], ln_s[0], ln_b[0], w_out[0], b_out[0, 0], eps)
    loss, pvf, _ = _pair_terms(
        score, d_i[0, :, 0], d_j[0, :, 0], v_i[0, :, 0], v_j[0, :, 0], thr)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        loss_out[...] = jnp.zeros_like(loss_out)
        cnt_out[...] = jnp.zeros_like(cnt_out)

    loss_out[...] += jnp.sum(loss).reshape(1, 1, 1)
    cnt_out[...] += jnp.sum(pvf).reshape(1, 1, 1)


def _bwd_row_kernel(u_i, u_j, d_i, d_j, v_i, v_j, bias, ln_s, ln_b, w_out,
                    b_out, g_ref, du_i, dbias, dln_s, dln_b, dw_out, db_out,
                    *, thr, eps):
    """Accumulates du for the i (row) role + all parameter grads.

    Grid (B, nI, nJ), j innermost: du_i's block index is constant across j,
    parameter grads use constant index maps — both are consecutive-visit
    accumulations."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    ln_s_v = ln_s[0]
    w_out_v = w_out[0]
    score, (diff, mu, inv, xhat, y, g, pre) = _tile_score(
        u_i[0], u_j[0], bias[0], ln_s_v, ln_b[0], w_out_v, b_out[0, 0], eps)
    _, _, dscore = _pair_terms(
        score, d_i[0, :, 0], d_j[0, :, 0], v_i[0, :, 0], v_j[0, :, 0], thr)
    gscale = g_ref[0, 0, 0]  # upstream d(loss_sum)

    dpre = gscale * dscore * (1.0 - score * score)          # (ROW, COL)
    dg = dpre[:, :, None] * w_out_v[None, None, :]          # (ROW, COL, h)
    dy = dg * _gelu_grad(y)
    dxhat = dy * ln_s_v[None, None, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    ddiff = inv * (dxhat - m1 - xhat * m2)                  # (ROW, COL, h)

    @pl.when(jnp.logical_and(b == 0, jnp.logical_and(i == 0, j == 0)))
    def _():
        dbias[...] = jnp.zeros_like(dbias)
        dln_s[...] = jnp.zeros_like(dln_s)
        dln_b[...] = jnp.zeros_like(dln_b)
        dw_out[...] = jnp.zeros_like(dw_out)
        db_out[...] = jnp.zeros_like(db_out)

    @pl.when(j == 0)
    def _():
        du_i[...] = jnp.zeros_like(du_i)

    du_i[...] += -jnp.sum(ddiff, axis=1)[None]              # i role: -ddiff
    dbias[...] += jnp.sum(ddiff, axis=(0, 1))[None]
    dln_s[...] += jnp.sum(dy * xhat, axis=(0, 1))[None]
    dln_b[...] += jnp.sum(dy, axis=(0, 1))[None]
    dw_out[...] += jnp.sum(dpre[:, :, None] * g, axis=(0, 1))[None]
    db_out[...] += jnp.sum(dpre).reshape(1, 1)


def _bwd_col_kernel(u_i, u_j, d_i, d_j, v_i, v_j, bias, ln_s, ln_b, w_out,
                    b_out, g_ref, du_j, *, thr, eps):
    """Accumulates du for the j (col) role. Grid (B, nJ, nI), i innermost so
    du_j's block is constant across the inner loop."""
    i = pl.program_id(2)

    ln_s_v = ln_s[0]
    w_out_v = w_out[0]
    score, (diff, mu, inv, xhat, y, g, pre) = _tile_score(
        u_i[0], u_j[0], bias[0], ln_s_v, ln_b[0], w_out_v, b_out[0, 0], eps)
    _, _, dscore = _pair_terms(
        score, d_i[0, :, 0], d_j[0, :, 0], v_i[0, :, 0], v_j[0, :, 0], thr)
    gscale = g_ref[0, 0, 0]

    dpre = gscale * dscore * (1.0 - score * score)
    dg = dpre[:, :, None] * w_out_v[None, None, :]
    dy = dg * _gelu_grad(y)
    dxhat = dy * ln_s_v[None, None, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    ddiff = inv * (dxhat - m1 - xhat * m2)

    @pl.when(i == 0)
    def _():
        du_j[...] = jnp.zeros_like(du_j)

    du_j[...] += jnp.sum(ddiff, axis=0)[None]               # j role: +ddiff


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _common_specs(B, Np, h, order):
    """BlockSpecs for (u_i, u_j, d_i, d_j, v_i, v_j, bias, ln_s, ln_b,
    w_out, b_out, g). order='ij' -> grid (B, nI, nJ); 'ji' -> (B, nJ, nI)."""
    if order == "ij":
        imap = lambda b, i, j: (b, i, 0)   # noqa: E731
        jmap = lambda b, i, j: (b, j, 0)   # noqa: E731
    else:
        imap = lambda b, j, i: (b, i, 0)   # noqa: E731
        jmap = lambda b, j, i: (b, j, 0)   # noqa: E731
    const1 = lambda *a: (0, 0)             # noqa: E731
    return [
        pl.BlockSpec((1, ROW, h), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, COL, h), jmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ROW, 1), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, COL, 1), jmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ROW, 1), imap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, COL, 1), jmap, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), const1, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), const1, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), const1, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h), const1, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), const1, memory_space=pltpu.VMEM),
    ]


def _prep(u, bias, ln_s, ln_b, w_out, b_out, depths, valid):
    B, N, h = u.shape
    Np = ((N + max(ROW, COL) - 1) // max(ROW, COL)) * max(ROW, COL)
    u_p = _pad_to(u.astype(jnp.float32), Np, 1)
    d_p = _pad_to(depths.astype(jnp.float32), Np, 1)[..., None]
    v_p = _pad_to(valid.astype(jnp.float32), Np, 1)[..., None]
    return (B, N, Np, h, u_p, d_p, v_p,
            bias.reshape(1, h).astype(jnp.float32),
            ln_s.reshape(1, h).astype(jnp.float32),
            ln_b.reshape(1, h).astype(jnp.float32),
            w_out.reshape(1, h).astype(jnp.float32),
            b_out.reshape(1, 1).astype(jnp.float32))


def _fwd_impl(u, bias, ln_s, ln_b, w_out, b_out, depths, valid, thr, eps,
              interpret):
    (B, N, Np, h, u_p, d_p, v_p, bias_r, ln_s_r, ln_b_r, w_out_r,
     b_out_r) = _prep(u, bias, ln_s, ln_b, w_out, b_out, depths, valid)
    grid = (B, Np // ROW, Np // COL)
    loss_sum, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, thr=thr, eps=eps),
        grid=grid,
        in_specs=_common_specs(B, Np, h, "ij"),
        out_specs=[
            pl.BlockSpec((1, 1, 1), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(u_p, u_p, d_p, d_p, v_p, v_p, bias_r, ln_s_r, ln_b_r, w_out_r, b_out_r)
    return loss_sum[:, 0, 0], cnt[:, 0, 0]


def _reference(u, bias, ln_s, ln_b, w_out, b_out, depths, valid, thr, eps):
    """Pure-jnp fallback (CPU path + parity oracle)."""
    diff = u[:, None, :, :] - u[:, :, None, :] + bias
    mu = jnp.mean(diff, -1, keepdims=True)
    var = jnp.mean((diff - mu) ** 2, -1, keepdims=True)
    y = (diff - mu) * jax.lax.rsqrt(var + eps) * ln_s + ln_b
    score = jnp.tanh(jnp.sum(_gelu(y) * w_out, -1) + b_out)
    di = depths[:, :, None]
    dj = depths[:, None, :]
    alpha = jnp.sign(dj - di)
    pv = (jnp.abs(dj - di) > thr) & valid[:, :, None] & valid[:, None, :]
    pvf = pv.astype(score.dtype)
    loss = jnp.log1p(jnp.exp(-alpha * score))
    return jnp.sum(loss * pvf, axis=(1, 2)), jnp.sum(pvf, axis=(1, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _pairwise_rank_sums(u, bias, ln_s, ln_b, w_out, b_out, depths, valid,
                        thr, eps, interpret):
    if interpret or jax.default_backend() == "tpu":
        return _fwd_impl(u, bias, ln_s, ln_b, w_out, b_out, depths, valid,
                         thr, eps, interpret)
    return _reference(u, bias, ln_s, ln_b, w_out, b_out, depths, valid, thr,
                      eps)


def _vjp_fwd(u, bias, ln_s, ln_b, w_out, b_out, depths, valid, thr, eps,
             interpret):
    out = _pairwise_rank_sums(u, bias, ln_s, ln_b, w_out, b_out, depths,
                              valid, thr, eps, interpret)
    return out, (u, bias, ln_s, ln_b, w_out, b_out, depths, valid)


def _vjp_bwd(thr, eps, interpret, res, gs):
    u, bias, ln_s, ln_b, w_out, b_out, depths, valid = res
    g_loss, _ = gs  # count output is non-differentiable (mask arithmetic)

    if not (interpret or jax.default_backend() == "tpu"):
        def loss_only(u, bias, ln_s, ln_b, w_out, b_out):
            s, _ = _reference(u, bias, ln_s, ln_b, w_out, b_out, depths,
                              valid, thr, eps)
            return jnp.sum(s * g_loss)

        grads = jax.grad(loss_only, argnums=(0, 1, 2, 3, 4, 5))(
            u, bias, ln_s, ln_b, w_out, b_out)
        return (*grads, None, None)

    (B, N, Np, h, u_p, d_p, v_p, bias_r, ln_s_r, ln_b_r, w_out_r,
     b_out_r) = _prep(u, bias, ln_s, ln_b, w_out, b_out, depths, valid)
    g_r = g_loss.reshape(B, 1, 1).astype(jnp.float32)
    g_spec_ij = pl.BlockSpec((1, 1, 1), lambda b, i, j: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    g_spec_ji = pl.BlockSpec((1, 1, 1), lambda b, j, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)

    du_i, dbias, dln_s, dln_b, dw_out, db_out = pl.pallas_call(
        functools.partial(_bwd_row_kernel, thr=thr, eps=eps),
        grid=(B, Np // ROW, Np // COL),
        in_specs=_common_specs(B, Np, h, "ij") + [g_spec_ij],
        out_specs=[
            pl.BlockSpec((1, ROW, h), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(u_p, u_p, d_p, d_p, v_p, v_p, bias_r, ln_s_r, ln_b_r, w_out_r, b_out_r,
      g_r)

    du_j = pl.pallas_call(
        functools.partial(_bwd_col_kernel, thr=thr, eps=eps),
        grid=(B, Np // COL, Np // ROW),
        in_specs=_common_specs(B, Np, h, "ji") + [g_spec_ji],
        out_specs=pl.BlockSpec((1, COL, h), lambda b, j, i: (b, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, h), jnp.float32),
        interpret=interpret,
    )(u_p, u_p, d_p, d_p, v_p, v_p, bias_r, ln_s_r, ln_b_r, w_out_r, b_out_r,
      g_r)

    du = (du_i + du_j)[:, :N].astype(u.dtype)
    return (du, dbias[0].astype(bias.dtype).reshape(bias.shape),
            dln_s[0].astype(ln_s.dtype).reshape(ln_s.shape),
            dln_b[0].astype(ln_b.dtype).reshape(ln_b.shape),
            dw_out[0].astype(w_out.dtype).reshape(w_out.shape),
            db_out.reshape(b_out.shape).astype(b_out.dtype),
            None, None)


_pairwise_rank_sums.defvjp(_vjp_fwd, _vjp_bwd)


def pairwise_ranking_sums_fused(
    u: jnp.ndarray,
    bias: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_out: jnp.ndarray,
    b_out: jnp.ndarray,
    depths: jnp.ndarray,
    valid: jnp.ndarray,
    depth_threshold: float,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """Per-batch-row (sum of pair losses, count of valid pairs), fused.

    u (B, N, h): fusion_in outputs per keypoint; bias (h,): the fusion_in
    bias (the head's first Dense commutes with the pair subtraction —
    see Student.pairwise_score_diff); ln_scale/ln_bias/w_out (h,), b_out
    scalar array: the remaining DepthAwareFeatureFusion parameters.

    Callers combine the sums into per-view masked means (the reference
    averages TWO per-view means, which differ from a joint mean whenever
    the views' valid-pair counts differ)."""
    return _pairwise_rank_sums(
        u, bias, ln_scale, ln_bias, w_out, b_out, depths, valid,
        float(depth_threshold), float(eps), interpret)
