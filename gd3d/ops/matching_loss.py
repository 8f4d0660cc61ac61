"""MASt3R pretraining matching criteria: InfoNCE, true-AP scoring, the
per-image MatchingLoss gather, and ConfMatchingLoss — TPU-first.

Behavioral parity targets (the reference's vendored MASt3R):
  - get_similarities:          mast3r/losses.py:202-209
  - InfoNCE (all/proper/dual): mast3r/losses.py:237-272
  - APLoss (nq='torch'):       mast3r/losses.py:275-345
  - MatchingLoss (corres gather, negatives padding, blockwise shuffle):
                               mast3r/losses.py:348-461
  - ConfMatchingLoss (prod/mean conf, negative-quantile supervision):
                               mast3r/losses.py:463-508

TPU-first notes:
  - Everything is static-shape: the reference boolean-indexes
    (`loss[valid_matches]`); here per-match loss maps stay (B, N) and
    reductions are masked means.
  - The blockwise shuffle permutation is an INPUT (fold a jax PRNG key or
    numpy permutation in from the host) so the loss stays jittable; the
    reference draws it from np.random inside the loss.
  - APLoss's torch path asserts a constant number of positives per query
    and is only ever called with diagonal labels (npos = 1), so true AP
    reduces exactly to the reciprocal rank of the positive:
    AP_i = 1 / (1 + #{j : s_ij sorted before s_ii}). Reproduced with a
    descending argsort, matching torch.sort's ordering (ties follow the
    same sort; parity-tested on continuous scores). no-grad in the
    reference and stop_gradiented here.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def get_similarities(desc1: Array, desc2: Array, euc: bool = False) -> Array:
    """(B, N, D) x (B, M, D) -> (B, N, M) similarities
    (mast3r/losses.py:202-209): dot product, or 1/(1+euclidean) when euc."""
    if euc:
        d = jnp.linalg.norm(desc1[:, :, None] - desc2[:, None], axis=-1)
        return 1.0 / (1.0 + d)
    return jnp.einsum("bnd,bmd->bnm", desc1, desc2)


def infonce_loss(
    desc1: Array, desc2: Array,
    valid_matches: Optional[Array] = None,
    temperature: float = 0.07,
    eps: float = 1e-8,
    mode: str = "all",
    euc: bool = False,
) -> Array:
    """InfoNCE over block-diagonal positives (mast3r/losses.py:237-272),
    reduction='mean' over valid matches (the criterion default). NaN
    similarities are treated as -inf before the exp, as the reference does.
    desc2 may carry extra negatives (M >= N); positives are the diagonal."""
    B, N, _ = desc1.shape
    if valid_matches is None:
        valid_matches = jnp.ones((B, N), bool)
    sim = get_similarities(desc1, desc2, euc) / temperature
    sim = jnp.where(jnp.isnan(sim), -jnp.inf, sim)
    sim = jnp.exp(sim)
    positives = sim[:, jnp.arange(N), jnp.arange(N)]  # (B, N)
    if mode == "all":  # normalize by the total mass of the whole image pair
        denom = sim.sum(axis=-1).sum(axis=-1, keepdims=True)
        loss = -jnp.log(jnp.clip(positives / denom, eps))
    elif mode == "proper":
        loss = -(jnp.log(jnp.clip(
            positives / sim.sum(axis=-2)[:, :N], eps))
            + jnp.log(jnp.clip(positives / sim.sum(axis=-1), eps)))
    elif mode == "dual":
        loss = -jnp.log(jnp.clip(
            positives ** 2 / sim.sum(axis=-1) / sim.sum(axis=-2)[:, :N], eps))
    else:
        raise ValueError(f"bad InfoNCE mode {mode!r}")
    n = valid_matches.sum()
    return jnp.where(
        n > 0,
        jnp.where(valid_matches, loss, 0.0).sum() / jnp.maximum(n, 1),
        0.0,
    )


def ap_scores(scores: Array) -> Array:
    """True average precision with diagonal positives
    (mast3r/losses.py:309-331, nq='torch'): with a single positive per
    query this is the reciprocal rank 1/(1+posrank). (B, N, M) -> (B, N);
    no grad (the reference computes it under torch.no_grad())."""
    B, N, M = scores.shape
    order = jnp.argsort(-scores, axis=-1)  # descending, ties as sorted
    # position of the diagonal positive in the sorted order
    posmask = order == jnp.arange(N)[None, :, None]
    posrank = jnp.argmax(posmask, axis=-1)  # first (only) True
    return jax.lax.stop_gradient(1.0 / (1.0 + posrank.astype(scores.dtype)))


def gather_matching_descs(
    desc1_map: Array, desc2_map: Array,
    corres1: Array, corres2: Array,
) -> Tuple[Array, Array]:
    """Select per-correspondence descriptors from (B, H, W, D) maps at
    (B, N, 2) integer (x, y) pixel coords (MatchingLoss.get_matching_descs,
    mast3r/losses.py:391-410)."""
    B = desc1_map.shape[0]
    bid = jnp.arange(B)[:, None]
    d1 = desc1_map[bid, corres1[..., 1], corres1[..., 0]]
    d2 = desc2_map[bid, corres2[..., 1], corres2[..., 0]]
    return d1, d2


def blockwise_infonce(
    descs1: Array, descs2: Array, valid_matches: Array,
    perm: Optional[Array] = None,
    blocksize: int = 4096,
    temperature: float = 0.07,
    mode: str = "all",
    euc: bool = False,
) -> Array:
    """MatchingLoss.blockwise_criterion (mast3r/losses.py:414-447) with the
    InfoNCE criterion: when N > blocksize, shuffle matches with `perm`
    (B, N) int32 — an input, not internal RNG — and apply the criterion on
    the block diagonal only. N must divide by blocksize in that case, as
    the reference asserts."""
    B, N, D = descs1.shape
    if N <= blocksize:
        return infonce_loss(descs1, descs2, valid_matches,
                            temperature=temperature, mode=mode, euc=euc)
    if N % blocksize != 0:
        raise ValueError("can't chunk block-diagonal; check blocksize")
    if perm is not None:
        bid = jnp.arange(B)[:, None]
        descs1 = descs1[bid, perm]
        descs2 = descs2[bid, perm]
        valid_matches = valid_matches[bid, perm]
    n_chunks = N // blocksize
    return infonce_loss(
        descs1.reshape(B * n_chunks, blocksize, D),
        descs2.reshape(B * n_chunks, blocksize, D),
        valid_matches.reshape(B * n_chunks, blocksize),
        temperature=temperature, mode=mode, euc=euc)


def conf_matching_loss(
    gt1: Dict[str, Array], gt2: Dict[str, Array],
    pred1: Dict[str, Array], pred2: Dict[str, Array],
    alpha: float = 1.0,
    confmode: str = "prod",
    temperature: float = 0.07,
    mode: str = "all",
    neg_conf_loss_quantile: float = 0.0,
    use_pts3d: bool = False,
) -> Tuple[Array, Dict[str, Array]]:
    """ConfMatchingLoss(MatchingLoss(InfoNCE)) — the MASt3R pretraining
    matching term (mast3r/losses.py:463-508 over :348-461). Inputs mirror
    the reference: gt1['corres'] / gt2['corres'] (B, N, 2) int pixel
    coords, gt1['valid_corres'] (B, N); pred descriptor maps
    pred{1,2}['desc'] (B, H, W, D) + 'desc_conf' (or 'pts3d'/'conf' with
    use_pts3d, which also switches to euclidean similarities).

    Static-shape deviation, documented: the reference computes the
    per-match loss only at valid matches and means over them; invalid
    matches here contribute 0 via masked means (identical value). The
    negative-quantile term uses the quantile of the VALID per-match losses
    (the reference quantiles the selected-loss vector)."""
    dkey, ckey = ("pts3d", "conf") if use_pts3d else ("desc", "desc_conf")
    d1map = pred1[dkey]
    d2map = pred2["pts3d_in_other_view"] if use_pts3d else pred2[dkey]
    descs1, descs2 = gather_matching_descs(
        jnp.asarray(d1map), jnp.asarray(d2map),
        jnp.asarray(gt1["corres"]), jnp.asarray(gt2["corres"]))
    valid = jnp.asarray(gt1["valid_corres"])
    B = valid.shape[0]
    bid = jnp.arange(B)[:, None]
    c1 = jnp.asarray(pred1[ckey])[bid, gt1["corres"][..., 1],
                                  gt1["corres"][..., 0]]
    c2 = jnp.asarray(pred2[ckey])[bid, gt2["corres"][..., 1],
                                  gt2["corres"][..., 0]]

    # per-match InfoNCE map (reduction='none' analogue): recompute the
    # normalized loss per match, then conf-weight
    N = descs1.shape[1]
    sim = get_similarities(descs1, descs2, euc=use_pts3d) / temperature
    sim = jnp.where(jnp.isnan(sim), -jnp.inf, sim)
    sim = jnp.exp(sim)
    positives = sim[:, jnp.arange(N), jnp.arange(N)]
    if mode == "all":
        denom = sim.sum(axis=-1).sum(axis=-1, keepdims=True)
        loss_map = -jnp.log(jnp.clip(positives / denom, 1e-8))
    elif mode == "proper":
        loss_map = -(jnp.log(jnp.clip(positives / sim.sum(axis=-2), 1e-8))
                     + jnp.log(jnp.clip(positives / sim.sum(axis=-1), 1e-8)))
    elif mode == "dual":
        loss_map = -jnp.log(jnp.clip(
            positives ** 2 / sim.sum(axis=-1) / sim.sum(axis=-2), 1e-8))
    else:
        raise ValueError(f"bad InfoNCE mode {mode!r}")

    if confmode == "prod":
        conf_pos = c1 * c2
    elif confmode == "mean":
        conf_pos = 0.5 * (c1 + c2)
    else:
        raise ValueError(f"unknown conf mode {confmode!r}")

    weighted = loss_map * conf_pos - alpha * jnp.log(conf_pos)
    n = valid.sum()
    conf_loss = jnp.where(
        n > 0, jnp.where(valid, weighted, 0.0).sum() / jnp.maximum(n, 1), 0.0)

    details = {
        "matching_loss": jnp.where(
            n > 0,
            jnp.where(valid, loss_map, 0.0).sum() / jnp.maximum(n, 1), 0.0),
    }
    if neg_conf_loss_quantile:
        # the reference supervises confidences of UNMATCHED pixels toward a
        # quantile of the matched losses (mast3r/losses.py:497-506); here
        # "negatives" are the invalid rows of the same gather
        big = jnp.asarray(jnp.finfo(loss_map.dtype).max, loss_map.dtype)
        vals = jnp.sort(jnp.where(valid, loss_map, big).reshape(-1))
        # torch.quantile LINEARLY INTERPOLATES between the neighboring
        # order statistics when q*(n-1) is fractional — match it
        pos = neg_conf_loss_quantile * (n.astype(jnp.float32) - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32),
                      0, vals.shape[0] - 1)
        hi = jnp.clip(lo + 1, 0, vals.shape[0] - 1)
        frac = jnp.clip(pos - lo.astype(jnp.float32), 0.0, 1.0)
        neg_value = jax.lax.stop_gradient(
            vals[lo] * (1.0 - frac) + vals[hi] * frac)
        conf_neg = jnp.concatenate([c1, c2], axis=0)
        neg_mask = jnp.concatenate([~valid, ~valid], axis=0)
        neg_w = neg_value * conf_neg - alpha * jnp.log(conf_neg)
        nn = neg_mask.sum()
        neg_loss = jnp.where(
            nn > 0,
            jnp.where(neg_mask, neg_w, 0.0).sum() / jnp.maximum(nn, 1), 0.0)
        conf_loss = conf_loss + neg_loss
        details["neg_conf_loss"] = neg_loss
    details["matching_conf_loss"] = conf_loss
    return conf_loss, details
