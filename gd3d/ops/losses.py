"""Distillation losses, jit-friendly with padded-keypoint validity masks.

Parity targets:
  - smooth-AP matching loss: src/finetune_timm_mast3r.py:543-589 and
    src/finetune_timm_me.py:199-217
  - cost-volume KL: utils/losses.py:5-15
  - pairwise logistic depth-ranking: utils/losses.py:18-41
  - margin variant: utils/losses.py:44-69

Design difference from the reference (torch, dynamic shapes): every loss here
takes fixed-capacity keypoint buffers plus boolean validity masks so the whole
train step stays inside one XLA compilation. With all-valid masks each loss is
numerically identical to the reference formula.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from gd3d.ops.basic import temp_sigmoid


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """mean(x[mask]) with 0.0 when mask is empty (reference zero-loss guard)."""
    mask = mask.astype(x.dtype)
    count = jnp.sum(mask)
    return jnp.where(count > 0, jnp.sum(x * mask) / jnp.maximum(count, 1.0), 0.0)


def kl_divergence_map(
    teacher_cost: jnp.ndarray,
    student_cost: jnp.ndarray,
    eps: float = 1e-8,
    row_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Row-wise KL(teacher || student) on (B, HW, HW) cost maps.

    Matches utils/losses.py:5-15: both maps clamped to >= eps, KL summed over
    the last axis, mean over all rows (the reference includes masked-out rows;
    pass row_valid=None for exact parity).
    """
    p = jnp.maximum(teacher_cost, eps)
    q = jnp.maximum(student_cost, eps)
    kl_per_row = jnp.sum(p * jnp.log(p / q), axis=-1)  # (B, HW)
    if row_valid is None:
        return jnp.mean(kl_per_row)
    return _masked_mean(kl_per_row, row_valid)


def pairwise_logistic_ranking_loss(
    score_diff: jnp.ndarray,
    gt_depths: jnp.ndarray,
    depth_threshold: float = 0.0,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Pairwise logistic ranking loss on predicted depth-difference scores.

    Matches utils/losses.py:18-41 given
      score_diff[b, i, j] = head(feat_j - feat_i)   (B, N, N)
    (the head's first linear layer commutes with the subtraction, so callers
    can evaluate it per-point and form the pairwise difference in the low-dim
    bottleneck — see gd3d/models/student.py).

    alpha_ij = sign(depth_j - depth_i); pairs with |depth_j - depth_i| <=
    threshold (or touching an invalid keypoint) are excluded from the mean.
    """
    depth_i = gt_depths[:, :, None]
    depth_j = gt_depths[:, None, :]
    alpha = jnp.sign(depth_j - depth_i)
    pair_valid = jnp.abs(depth_j - depth_i) > depth_threshold
    if valid is not None:
        pair_valid = pair_valid & valid[:, :, None] & valid[:, None, :]

    # log(1 + exp(-alpha * s)) — scores are bounded (tanh head), no clamp needed
    loss = jnp.log1p(jnp.exp(-alpha * score_diff))
    return _masked_mean(loss, pair_valid)


def intra_depth_margin_loss(
    pred_diff: jnp.ndarray,
    gt_depths: jnp.ndarray,
    base_margin: float = 0.05,
    depth_thresh: float = 0.05,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Margin variant (utils/losses.py:44-69, unused by the pipeline).

    pred_diff[b, i, j] = head(feat_i - feat_j); target = sign(tanh(di - dj));
    hinge at base_margin, masked to pairs with |tanh(di-dj)| > depth_thresh.
    """
    depth_i = gt_depths[:, :, None]
    depth_j = gt_depths[:, None, :]
    gt_diff = jnp.tanh(depth_i - depth_j)
    target = jnp.sign(gt_diff)
    loss = jax.nn.relu(base_margin - target * pred_diff)
    pair_valid = jnp.abs(gt_diff) > depth_thresh
    if valid is not None:
        pair_valid = pair_valid & valid[:, :, None] & valid[:, None, :]
    return _masked_mean(loss, pair_valid)


def ap_loss_paired(
    desc_1: jnp.ndarray,
    desc_2: jnp.ndarray,
    pts3d_1: jnp.ndarray,
    pts3d_2: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    thres3d_neg: float = 0.1,
    temp: float = 0.01,
    legacy_rpos1: bool = False,
) -> jnp.ndarray:
    """Smooth-AP matching loss for 1:1-paired keypoints (MASt3R/VGGT path).

    Matches src/finetune_timm_mast3r.py:556-589: positives are the diagonal
    (kp i in view 1 <-> kp i in view 2); negatives are pairs whose teacher 3D
    points are farther than thres3d_neg; two ranking directions averaged.

    Args:
      desc_1, desc_2: (B, N, C) L2-normalized descriptors.
      pts3d_1, pts3d_2: (B, N, 3) teacher 3D points at the keypoints.
      valid: (B, N) bool — padded entries excluded from negatives and mean.
      legacy_rpos1: the two reference modules DIFFER in ap1's rpos —
        finetune_timm_mast3r.py:571 uses sigmoid(pos_sim-1)+1 (the old
        sigmoid(1-pos_sim) line is commented out there), while
        finetune_timm_vggt.py:556 still uses sigmoid(1-pos_sim)+1. Set
        True for the VGGT step.
    """
    B, N, _ = desc_1.shape
    sim = jnp.einsum("bnc,bmc->bnm", desc_1, desc_2)  # (B, N, N)
    dist = jnp.linalg.norm(pts3d_1[:, :, None, :] - pts3d_2[:, None, :, :], axis=-1)

    eye = jnp.eye(N, dtype=bool)[None]
    neg_mask = (dist > thres3d_neg) & ~eye
    if valid is not None:
        neg_mask = neg_mask & valid[:, :, None] & valid[:, None, :]

    pos_sim = jnp.diagonal(sim, axis1=1, axis2=2)  # (B, N)
    negf = neg_mask.astype(sim.dtype)

    if legacy_rpos1:
        rpos1 = temp_sigmoid(1.0 - pos_sim, temp) + 1.0
    else:
        rpos1 = temp_sigmoid(pos_sim - 1.0, temp) + 1.0
    rall1 = rpos1 + jnp.sum(temp_sigmoid(sim - 1.0, temp) * negf, axis=-1)
    ap1 = rpos1 / rall1

    rpos2 = temp_sigmoid(1.0 - pos_sim, temp) + 1.0
    rall2 = rpos2 + jnp.sum(
        temp_sigmoid(sim - pos_sim[:, :, None], temp) * negf, axis=-1
    )
    ap2 = rpos2 / rall2

    ap = (ap1 + ap2) / 2.0
    if valid is None:
        return jnp.mean(1.0 - ap)
    return _masked_mean(1.0 - ap, valid)


def ap_loss_me(
    desc_1: jnp.ndarray,
    desc_2: jnp.ndarray,
    pts3d_1: jnp.ndarray,
    pts3d_2: jnp.ndarray,
    valid_1: Optional[jnp.ndarray] = None,
    valid_2: Optional[jnp.ndarray] = None,
    thresh3d_pos: float = 5e-3,
    thres3d_neg: float = 0.1,
    temp: float = 0.01,
    max_pos: int = 8192,
    return_overflow: bool = False,
) -> jnp.ndarray:
    """Smooth-AP loss with distance-derived positives (MEF baseline path).

    Matches src/finetune_timm_me.py:199-217: every (i, j) with 3D distance
    < thresh3d_pos is a positive; negatives per source row i are targets with
    distance > thres3d_neg; two ranking directions averaged; mean over the
    positive pairs.

    The reference gathers a dynamic positive list via torch.nonzero. To stay
    static-shaped we gather the first `max_pos` positives in row-major order
    (lax.top_k on the positive mask is stable, so this matches torch.nonzero
    ordering) and mask the rest. Exact parity whenever the true positive
    count <= max_pos; beyond that the loss averages the first max_pos
    positives (documented capacity cap).
    """
    B, S, _ = desc_1.shape
    T = desc_2.shape[1]
    sim = jnp.einsum("bsc,btc->bst", desc_1, desc_2)  # (B, S, T)
    dist = jnp.linalg.norm(pts3d_1[:, :, None, :] - pts3d_2[:, None, :, :], axis=-1)

    pos_mask = dist < thresh3d_pos
    neg_mask = dist > thres3d_neg
    if valid_1 is not None:
        pos_mask = pos_mask & valid_1[:, :, None]
        neg_mask = neg_mask & valid_1[:, :, None]
    if valid_2 is not None:
        pos_mask = pos_mask & valid_2[:, None, :]
        neg_mask = neg_mask & valid_2[:, None, :]

    P = min(max_pos, S * T)

    def per_batch(sim_b, pos_b, neg_b):
        flat = pos_b.reshape(-1)
        vals, idx = jax.lax.top_k(flat.astype(jnp.float32), P)
        pvalid = vals > 0
        rows = idx // T
        cols = idx % T
        sim_rows = sim_b[rows]                      # (P, T)
        negf = neg_b[rows].astype(sim_b.dtype)      # (P, T)
        pos_sim = sim_b[rows, cols]                 # (P,)

        rpos1 = temp_sigmoid(pos_sim - 1.0, temp) + 1.0
        rall1 = rpos1 + jnp.sum(temp_sigmoid(sim_rows - 1.0, temp) * negf, -1)
        ap1 = rpos1 / rall1

        rpos2 = temp_sigmoid(1.0 - pos_sim, temp) + 1.0
        rall2 = rpos2 + jnp.sum(
            temp_sigmoid(sim_rows - pos_sim[:, None], temp) * negf, -1
        )
        ap2 = rpos2 / rall2

        ap = (ap1 + ap2) / 2.0
        return jnp.sum((1.0 - ap) * pvalid), jnp.sum(pvalid.astype(sim_b.dtype))

    sums, counts = jax.vmap(per_batch)(sim, pos_mask, neg_mask)
    total, count = jnp.sum(sums), jnp.sum(counts)
    loss = jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)
    if return_overflow:
        # positives dropped by the static cap (0 = exact reference parity);
        # the ME step logs this so a silently-truncated loss is visible
        true_pos = jnp.sum(pos_mask.astype(jnp.float32), axis=(1, 2))
        overflow = jnp.sum(jnp.maximum(true_pos - P, 0.0))
        return loss, overflow
    return loss
