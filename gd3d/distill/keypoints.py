"""On-device keypoint pipeline: reciprocal NN matching + filtering.

Parity targets:
  - fast_reciprocal_NNs (mast3r/fast_nn.py:109-188): init from a subsample
    grid (every 16 px starting at 8), iterate NN(desc1->desc2)->NN(desc2->
    desc1) up to 10 times, keep converged fixed points, merge to unique
    correspondences sorted on idx2 (merge_corres :87-106).
  - border + confidence filtering (src/finetune_timm_mast3r.py:419-459):
    3 px border on BOTH views, bottom-10%-percentile confidence threshold
    per view, kp kept if conf-valid in EITHER view (the reference unions the
    two index lists at :456).

The reference bounces through numpy (np.mgrid, np.unique); here everything
is static-shaped jnp: G grid slots with a validity mask, argmax streamed
over database blocks (the TPU analogue of fast_nn's block_size=2^13 loop).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from gd3d.ops.basic import kth_smallest


def blockwise_argmax_dot(
    queries: jnp.ndarray, db: jnp.ndarray, block: int = 8192
) -> jnp.ndarray:
    """argmax_n (queries @ db^T) streamed over db blocks. (G, D) x (N, D) ->
    (G,) int32. Mirrors bruteforce_reciprocal_nns' dot path
    (mast3r/fast_nn.py:31-36,52-68) without materializing (G, N)."""
    G, D = queries.shape
    N = db.shape[0]
    pad = (-N) % block
    if pad:
        db = jnp.pad(db, ((0, pad), (0, 0)))
    n_blocks = (N + pad) // block
    db_blocks = db.reshape(n_blocks, block, D)

    def body(carry, db_blk_i):
        best, best_idx, offset = carry
        sim = queries @ db_blk_i.T  # (G, block)
        # mask padded rows to -inf
        col_ids = offset + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        sim = jnp.where(col_ids < N, sim, -jnp.inf)
        blk_best = jnp.max(sim, axis=1)
        blk_idx = jnp.argmax(sim, axis=1).astype(jnp.int32) + offset
        take = blk_best > best
        return (
            jnp.where(take, blk_best, best),
            jnp.where(take, blk_idx, best_idx),
            offset + block,
        ), None

    init = (
        jnp.full((G,), -jnp.inf, queries.dtype),
        jnp.zeros((G,), jnp.int32),
        jnp.int32(0),
    )
    (best, best_idx, _), _ = jax.lax.scan(body, init, db_blocks)
    return best_idx


def subsample_grid_indices(H: int, W: int, S: int) -> jnp.ndarray:
    """np.mgrid[S//2:H:S, S//2:W:S] flattened to linear indices (fast_nn:128)."""
    ys = jnp.arange(S // 2, H, S)
    xs = jnp.arange(S // 2, W, S)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return (yy * W + xx).reshape(-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("H", "W", "subsample", "max_iter"))
def reciprocal_nn_grid(
    desc1: jnp.ndarray,
    desc2: jnp.ndarray,
    H: int,
    W: int,
    subsample: int = 16,
    max_iter: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-point reciprocal NN from a subsample grid.

    desc1/desc2: (H, W, D) L2-ish descriptors (dot similarity).
    Returns xy1, xy2 linear indices (G,) and converged mask (G,).
    """
    d1 = desc1.reshape(-1, desc1.shape[-1])
    d2 = desc2.reshape(-1, desc2.shape[-1])
    xy1_init = subsample_grid_indices(H, W, subsample)
    G = xy1_init.shape[0]

    def cond(carry):
        _, _, _, _, notyet, it = carry
        return jnp.logical_and(jnp.any(notyet), it < max_iter)

    def body(carry):
        xy1, xy2, old_xy1, old_xy2, notyet, it = carry
        new_xy2 = blockwise_argmax_dot(d1[xy1], d2)
        xy2 = jnp.where(notyet, new_xy2, xy2)
        notyet = notyet & (old_xy2 != xy2)
        new_xy1 = blockwise_argmax_dot(d2[xy2], d1)
        xy1 = jnp.where(notyet, new_xy1, xy1)
        notyet = notyet & (old_xy1 != xy1)
        return (xy1, xy2, xy1, xy2, notyet, it + 1)

    init = (
        xy1_init,
        jnp.full((G,), -1, jnp.int32),
        xy1_init,
        jnp.full((G,), -1, jnp.int32),
        jnp.ones((G,), bool),
        jnp.int32(0),
    )
    # early-exit while_loop: typically converges in ~3 iterations, matching
    # the reference's `while notyet.any()` with max_iter=10 (fast_nn:152-168)
    xy1, xy2, _, _, notyet, _ = jax.lax.while_loop(cond, body, init)
    return xy1, xy2, ~notyet


def merge_corres_static(
    xy1: jnp.ndarray, xy2: jnp.ndarray, valid: jnp.ndarray, HW1: int, HW2: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unique (xy2, xy1) pairs sorted on xy2-major (merge_corres,
    fast_nn.py:87-106), static shape: invalid slots sort to the end.

    Lexicographic (xy2, xy1) order via two stable sorts — avoids the int64
    composite key (xy2 * HW1 + xy1 overflows int32 at 512-res grids and x64
    is disabled by default in JAX)."""
    del HW2
    big1 = jnp.int32(HW1)  # sentinel > any valid linear index
    k1 = jnp.where(valid, xy1, big1)
    k2 = jnp.where(valid, xy2, big1)
    order1 = jnp.argsort(k1, stable=True)
    k2s = k2[order1]
    order2 = jnp.argsort(k2s, stable=True)
    order = order1[order2]
    sxy1 = xy1[order]
    sxy2 = xy2[order]
    svalid = valid[order]
    same = (sxy1[1:] == sxy1[:-1]) & (sxy2[1:] == sxy2[:-1]) & svalid[:-1]
    uniq = jnp.concatenate([jnp.asarray([True]), ~same])
    return sxy1, sxy2, svalid & uniq


def filter_and_match_keypoints(
    feats: Dict[str, jnp.ndarray],
    H: int,
    W: int,
    subsample: int = 16,
    border: int = 3,
    min_conf_percent: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full keypoint pipeline for one pair (B=1 slices of the teacher dict).

    feats: desc_1/desc_2 (H, W, 24), conf_1/conf_2 (H, W).
    Returns kp_1, kp_2 float (G, 2) as (x, y) and valid (G,).
    """
    xy1, xy2, conv = reciprocal_nn_grid(
        feats["desc_1"], feats["desc_2"], H, W, subsample
    )
    xy1, xy2, valid = merge_corres_static(xy1, xy2, conv, H * W, H * W)

    x1, y1 = xy1 % W, xy1 // W
    x2, y2 = xy2 % W, xy2 // W
    in_border = (
        (x1 >= border) & (x1 < W - border) & (y1 >= border) & (y1 < H - border)
        & (x2 >= border) & (x2 < W - border) & (y2 >= border) & (y2 < H - border)
    )
    valid = valid & in_border

    # percentile confidence thresholds (finetune_timm_mast3r.py:441-451)
    conf1 = feats["conf_1"].reshape(-1)
    conf2 = feats["conf_2"].reshape(-1)
    q = int(conf1.shape[0] * min_conf_percent * 0.01)
    # exact sorted[q] via bisection select — the full 336x512 sorts were
    # ~4 ms/step of the flagship trace (gd3d/ops/basic.py::kth_smallest)
    th1 = kth_smallest(conf1, q)
    th2 = kth_smallest(conf2, q)
    ok1 = conf1[xy1] >= th1
    ok2 = conf2[xy2] >= th2
    valid = valid & (ok1 | ok2)  # union semantics (:456)

    kp1 = jnp.stack([x1, y1], axis=-1).astype(jnp.float32)
    kp2 = jnp.stack([x2, y2], axis=-1).astype(jnp.float32)
    return kp1, kp2, valid
