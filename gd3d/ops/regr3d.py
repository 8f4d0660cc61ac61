"""DUSt3R pretraining criteria: Regr3D (+shift/scale-invariant variants)
and ConfLoss, TPU-first.

Behavioral parity targets (all in the reference's vendored DUSt3R):
  - Regr3D / Regr3D_ShiftInv / Regr3D_ScaleInv / Regr3D_ScaleShiftInv:
    dust3r/dust3r/losses.py:143-299
  - ConfLoss (conf-weighted pixel loss - alpha*log(conf)):
    dust3r/dust3r/losses.py:197-230
  - normalize_pointcloud (avg_dis / median_dis):
    dust3r/dust3r/utils/geometry.py:249-310
  - get_joint_pointcloud_depth / _center_scale (masked medians):
    dust3r/dust3r/utils/geometry.py:313-342
  - get_pred_pts3d routing: dust3r/dust3r/inference.py:100-122

TPU-first design notes (vs the torch original):
  - The torch code boolean-indexes valid pixels (``pred_pts1[mask1]``) —
    dynamic shapes. Here every map stays (B, H, W[, 3]) and reductions are
    masked sums/medians, so one XLA program serves every batch.
  - torch.nanmedian picks the LOWER of the two middle elements; the masked
    median here reproduces that exactly (sort with invalid -> +inf, take
    element (n-1)//2), so values match the reference bit-for-bit in fp32.
  - Medians/scales are stop_gradiented exactly where the reference detaches
    (`.detach()` on median norm_factor and the @torch.no_grad() helpers).
  - Losses are per-SAMPLE-mean over valid pixels of the whole batch
    (the reference flattens all valid pixels of the batch together; we
    reproduce that with masked sums over (B, H, W)).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


# --------------------------------------------------------------- primitives
def geotrf(pose: Array, pts: Array) -> Array:
    """Apply (B, 4, 4) rigid/affine transforms to (B, ..., 3) points
    (dust3r/dust3r/utils/geometry.py geotrf, dense-pointmap case)."""
    R = pose[:, :3, :3]
    t = pose[:, :3, 3]
    shape = pts.shape
    flat = pts.reshape(shape[0], -1, 3)
    out = jnp.einsum("bij,bnj->bni", R, flat) + t[:, None]
    return out.reshape(shape)


def inv_pose(pose: Array) -> Array:
    """Invert (B, 4, 4) rigid poses: [R t]^-1 = [R^T, -R^T t]."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -jnp.einsum("...ij,...j->...i", Rt, t)[..., None]],
                          axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], pose.dtype), top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)


def masked_median(x: Array, mask: Array) -> Array:
    """Per-row median of x (B, N) over mask==True, matching torch.nanmedian
    (LOWER middle element for even counts). Rows with no valid entries
    return 0 (the reference never hits that case; callers guard)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xs = jnp.sort(jnp.where(mask, x, big), axis=-1)
    n = mask.sum(axis=-1)
    idx = jnp.maximum(n - 1, 0) // 2
    med = jnp.take_along_axis(xs, idx[:, None], axis=-1)[:, 0]
    return jnp.where(n > 0, med, 0.0)


def normalize_pointcloud(
    pts1: Array, pts2: Optional[Array], norm_mode: str,
    valid1: Array, valid2: Optional[Array],
) -> Tuple[Array, Optional[Array], Array]:
    """Joint renormalization of two pointmaps (geometry.py:249-310).

    Supported: 'avg_dis' (the training default) and 'median_dis'.
    Returns (pts1/f, pts2/f, f) with f (B,). The median factor is
    stop_gradiented as the reference detaches it; the avg factor carries
    gradient (reference: plain mean, no detach).
    """
    mode, dis = norm_mode.split("_")
    if dis != "dis":
        raise ValueError(f"unsupported dis mode {dis!r} (only 'dis')")
    B = pts1.shape[0]
    d1 = jnp.linalg.norm(pts1, axis=-1).reshape(B, -1)
    m1 = valid1.reshape(B, -1)
    if pts2 is not None:
        d2 = jnp.linalg.norm(pts2, axis=-1).reshape(B, -1)
        m2 = valid2.reshape(B, -1)
        dis_all = jnp.concatenate([d1, d2], axis=1)
        mask_all = jnp.concatenate([m1, m2], axis=1)
    else:
        dis_all, mask_all = d1, m1
    if mode == "avg":
        nnz = mask_all.sum(axis=1)
        factor = jnp.where(mask_all, dis_all, 0.0).sum(axis=1) / (nnz + 1e-8)
    elif mode == "median":
        factor = jax.lax.stop_gradient(masked_median(dis_all, mask_all))
    else:
        raise ValueError(f"unsupported norm mode {mode!r}")
    factor = jnp.clip(factor, 1e-8)[:, None, None, None]
    out2 = None if pts2 is None else pts2 / factor
    return pts1 / factor, out2, factor[:, 0, 0, 0]


def joint_pointcloud_depth(z1: Array, z2: Array, m1: Array, m2: Array) -> Array:
    """Masked joint median depth (geometry.py:313-324, quantile 0.5).
    No grad, as the reference wraps it in @torch.no_grad()."""
    B = z1.shape[0]
    z = jnp.concatenate([z1.reshape(B, -1), z2.reshape(B, -1)], axis=1)
    m = jnp.concatenate([m1.reshape(B, -1), m2.reshape(B, -1)], axis=1)
    return jax.lax.stop_gradient(masked_median(z, m))


def joint_pointcloud_center_scale(
    pts1: Array, pts2: Array, m1: Array, m2: Array
) -> Tuple[Array, Array]:
    """Masked joint median center (B, 3) + median norm-about-center (B,)
    (geometry.py:328-342). No grad (reference: @torch.no_grad())."""
    B = pts1.shape[0]
    p = jnp.concatenate(
        [pts1.reshape(B, -1, 3), pts2.reshape(B, -1, 3)], axis=1)
    m = jnp.concatenate([m1.reshape(B, -1), m2.reshape(B, -1)], axis=1)
    center = jnp.stack(
        [masked_median(p[..., k], m) for k in range(3)], axis=-1)  # (B, 3)
    norm = jnp.linalg.norm(p - center[:, None], axis=-1)
    scale = masked_median(norm, m)
    return (jax.lax.stop_gradient(center),
            jax.lax.stop_gradient(scale))


def get_pred_pts3d(pred: Dict[str, Array], use_pose: bool) -> Array:
    """Prediction routing (inference.py:100-122): pred pointmap in view1's
    frame. DUSt3R heads emit 'pts3d' (view 1) / 'pts3d_in_other_view'
    (view 2, already expressed in camera 1)."""
    if "pts3d_in_other_view" in pred:
        if not use_pose:
            raise ValueError("pts3d_in_other_view requires use_pose=True")
        return pred["pts3d_in_other_view"]
    pts = pred["pts3d"]
    if use_pose:
        pts = geotrf(pred["camera_pose"], pts)
    return pts


# ----------------------------------------------------------------- criteria
def regr3d_pointmaps(
    gt1: Dict[str, Array], gt2: Dict[str, Array],
    pred1: Dict[str, Array], pred2: Dict[str, Array],
    norm_mode: Optional[str] = "avg_dis",
    gt_scale: bool = False,
    shift_inv: bool = False,
    scale_inv: bool = False,
    dist_clip: Optional[float] = None,
) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """get_all_pts3d (losses.py:158-185) + the Shift/ScaleInv overrides
    (:243-299): everything expressed in camera 1, optionally normalized,
    shift-centered (median z) and scale-normalized (median norm).

    Returns (gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2)."""
    in_cam1 = inv_pose(jnp.asarray(gt1["camera_pose"]))
    gt_pts1 = geotrf(in_cam1, jnp.asarray(gt1["pts3d"]))
    gt_pts2 = geotrf(in_cam1, jnp.asarray(gt2["pts3d"]))
    valid1 = jnp.asarray(gt1["valid_mask"])
    valid2 = jnp.asarray(gt2["valid_mask"])
    if dist_clip is not None:
        valid1 = valid1 & (jnp.linalg.norm(gt_pts1, axis=-1) <= dist_clip)
        valid2 = valid2 & (jnp.linalg.norm(gt_pts2, axis=-1) <= dist_clip)

    # jnp coercion matters: numpy inputs would reach the .at[] updates below
    # when norm_mode is None (numpy has no .at)
    pr_pts1 = jnp.asarray(get_pred_pts3d(pred1, use_pose=False))
    pr_pts2 = jnp.asarray(get_pred_pts3d(pred2, use_pose=True))

    if norm_mode:
        pr_pts1, pr_pts2, _ = normalize_pointcloud(
            pr_pts1, pr_pts2, norm_mode, valid1, valid2)
        if not gt_scale:
            gt_pts1, gt_pts2, _ = normalize_pointcloud(
                gt_pts1, gt_pts2, norm_mode, valid1, valid2)

    if shift_inv:  # Regr3D_ShiftInv (losses.py:243-265)
        gt_shift = joint_pointcloud_depth(
            gt_pts1[..., 2], gt_pts2[..., 2], valid1, valid2)[:, None, None]
        pr_shift = joint_pointcloud_depth(
            pr_pts1[..., 2], pr_pts2[..., 2], valid1, valid2)[:, None, None]
        gt_pts1 = gt_pts1.at[..., 2].add(-gt_shift)
        gt_pts2 = gt_pts2.at[..., 2].add(-gt_shift)
        pr_pts1 = pr_pts1.at[..., 2].add(-pr_shift)
        pr_pts2 = pr_pts2.at[..., 2].add(-pr_shift)

    if scale_inv:  # Regr3D_ScaleInv (losses.py:268-295)
        _, gt_s = joint_pointcloud_center_scale(
            gt_pts1, gt_pts2, valid1, valid2)
        _, pr_s = joint_pointcloud_center_scale(
            pr_pts1, pr_pts2, valid1, valid2)
        pr_s = jnp.clip(pr_s, 1e-3, 1e3)
        gt_s = gt_s[:, None, None, None]
        pr_s = pr_s[:, None, None, None]
        if gt_scale:
            pr_pts1 = pr_pts1 * (gt_s / pr_s)
            pr_pts2 = pr_pts2 * (gt_s / pr_s)
        else:
            gt_pts1, gt_pts2 = gt_pts1 / gt_s, gt_pts2 / gt_s
            pr_pts1, pr_pts2 = pr_pts1 / pr_s, pr_pts2 / pr_s

    return gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2


def regr3d_loss(
    gt1, gt2, pred1, pred2,
    norm_mode: Optional[str] = "avg_dis",
    gt_scale: bool = False,
    shift_inv: bool = False,
    scale_inv: bool = False,
    dist_clip: Optional[float] = None,
) -> Tuple[Array, Array, Array, Array]:
    """Per-pixel L21 regression maps (Regr3D.compute_loss, losses.py:187-195
    with the L21 criterion, :54-61): returns (l1_map, l2_map, valid1,
    valid2), each (B, H, W). Mean over valid pixels of l1+l2 reproduces the
    reference's reduction='mean' over boolean-selected pixels."""
    gt_pts1, gt_pts2, pr_pts1, pr_pts2, valid1, valid2 = regr3d_pointmaps(
        gt1, gt2, pred1, pred2, norm_mode, gt_scale, shift_inv, scale_inv,
        dist_clip)
    l1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    l2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)
    return l1, l2, valid1, valid2


def masked_mean(x: Array, mask: Array) -> Array:
    n = mask.sum()
    return jnp.where(n > 0, jnp.where(mask, x, 0.0).sum() / jnp.maximum(n, 1),
                     0.0)


def conf_regr3d_loss(
    gt1, gt2, pred1, pred2,
    alpha: float = 0.2,
    norm_mode: Optional[str] = "avg_dis",
    gt_scale: bool = False,
    shift_inv: bool = False,
    scale_inv: bool = False,
    dist_clip: Optional[float] = None,
) -> Tuple[Array, Dict[str, Array]]:
    """ConfLoss(Regr3D(L21, norm_mode), alpha) — the DUSt3R training
    criterion (losses.py:197-230; the released models train with
    alpha=0.2). conf maps are the head outputs (already >= 1 through the
    exp/softplus conf activation); per-pixel:
    conf * l - alpha * log(conf), masked-mean per view, summed.

    Zero-valid-pixel batches contribute 0 for that view (the reference's
    `if numel()==0` branch) — here a static-shape masked-mean guard."""
    l1, l2, valid1, valid2 = regr3d_loss(
        gt1, gt2, pred1, pred2, norm_mode, gt_scale, shift_inv, scale_inv,
        dist_clip)
    c1, c2 = pred1["conf"], pred2["conf"]
    cl1 = masked_mean(l1 * c1 - alpha * jnp.log(c1), valid1)
    cl2 = masked_mean(l2 * c2 - alpha * jnp.log(c2), valid2)
    details = {
        "conf_loss_1": cl1, "conf_loss2": cl2,
        "Regr3D_pts3d_1": masked_mean(l1, valid1),
        "Regr3D_pts3d_2": masked_mean(l2, valid2),
    }
    return cl1 + cl2, details


def find_opt_scaling(
    gt_pts1: Array, gt_pts2: Optional[Array],
    pr_pts1: Array, pr_pts2: Optional[Array] = None,
    fit_mode: str = "weiszfeld_stop_grad",
    valid1: Optional[Array] = None, valid2: Optional[Array] = None,
) -> Array:
    """Per-sample scale s minimizing |pr - s*gt| (dust3r/inference.py:
    125-169): 'avg' closed form, 'median' of per-point ratios, or
    'weiszfeld' IRLS (10 fixed iterations — a lax.fori-free static loop).
    Masked means/medians replace the reference's NaN-poisoning; *_stop_grad
    detaches, and the result clips at 1e-3 as the reference does."""
    B = gt_pts1.shape[0]

    def flat(p, v, like):
        if p is None:
            return None, None
        p = jnp.asarray(p).reshape(B, -1, 3)
        if v is None:
            m = jnp.ones(p.shape[:2], bool)
        else:
            m = jnp.asarray(v).reshape(B, -1)
        return p, m

    g1, m1 = flat(gt_pts1, valid1, None)
    g2, m2 = flat(gt_pts2, valid2, None)
    p1, _ = flat(pr_pts1, None, None)
    p2, _ = flat(pr_pts2, None, None)
    if g2 is not None:
        gt = jnp.concatenate([g1, g2], axis=1)
        pr = jnp.concatenate([p1, p2], axis=1)
        m = jnp.concatenate([m1, m2], axis=1)
    else:
        gt, pr, m = g1, p1, m1

    dot_gt_pr = (pr * gt).sum(axis=-1)
    dot_gt_gt = (gt ** 2).sum(axis=-1)

    def mmean(x):
        n = m.sum(axis=1)
        return jnp.where(m, x, 0.0).sum(axis=1) / jnp.maximum(n, 1)

    if fit_mode.startswith("avg"):
        scaling = mmean(dot_gt_pr) / mmean(dot_gt_gt)
    elif fit_mode.startswith("median"):
        scaling = masked_median(dot_gt_pr / jnp.clip(dot_gt_gt, 1e-12), m)
    elif fit_mode.startswith("weiszfeld"):
        scaling = mmean(dot_gt_pr) / mmean(dot_gt_gt)
        for _ in range(10):
            dis = jnp.linalg.norm(pr - scaling[:, None, None] * gt, axis=-1)
            w = 1.0 / jnp.clip(dis, 1e-8)
            scaling = mmean(w * dot_gt_pr) / mmean(w * dot_gt_gt)
    else:
        raise ValueError(f"bad fit_mode {fit_mode!r}")
    if fit_mode.endswith("stop_grad"):
        scaling = jax.lax.stop_gradient(scaling)
    return jnp.clip(scaling, 1e-3)


# ------------------------------------------- MASt3R fork of the criterion
def apply_log_to_norm(xyz: Array) -> Array:
    """Log-warp point norms (mast3r/losses.py:20-24): direction preserved,
    |p| -> log1p(|p|)."""
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return xyz / jnp.clip(d, 1e-8) * jnp.log1p(d)


def mast3r_regr3d_maps(
    gt1, gt2, pred1, pred2,
    norm_mode: str = "?avg_dis",
    gt_scale: bool = False,
    dist_clip: Optional[float] = None,
    sky_loss_value: float = 2.0,
    max_metric_scale: float = 0.0,
    loss_in_log=False,
) -> Tuple[Array, Array, Array, Array]:
    """The MASt3R fork of Regr3D (mast3r/losses.py:27-137), per-pixel form.

    Differences from the DUSt3R base, all mirrored here:
      - a leading '?' in norm_mode exempts metric-scale samples
        (gt1['is_metric_scale'] (B,)) from prediction self-normalization:
        their predictions are divided by the GT norm factor instead, so the
        model learns true metric scale on metric datasets (:69-97)
      - max_metric_scale demotes metric samples whose farthest valid GT
        point exceeds the threshold (:68-82)
      - sky pixels (gt['sky_mask'] & ~valid) join the loss mask with a
        CONSTANT loss value sky_loss_value (:101-135), supervising conf
      - loss_in_log: 'before' log-warps GT before normalization (linear
        depth_mode); truthy-else log-warps both maps before the L21
        (:61-63, :122-131)

    Returns (l1_map, l2_map, mask1, mask2): masks include sky pixels and
    the maps already carry sky_loss_value there; masked means over them
    reproduce the reference's selected-pixel reductions."""
    in_cam1 = inv_pose(jnp.asarray(gt1["camera_pose"]))
    gt_pts1 = geotrf(in_cam1, jnp.asarray(gt1["pts3d"]))
    gt_pts2 = geotrf(in_cam1, jnp.asarray(gt2["pts3d"]))
    valid1 = jnp.asarray(gt1["valid_mask"])
    valid2 = jnp.asarray(gt2["valid_mask"])
    if dist_clip is not None:
        valid1 = valid1 & (jnp.linalg.norm(gt_pts1, axis=-1) <= dist_clip)
        valid2 = valid2 & (jnp.linalg.norm(gt_pts2, axis=-1) <= dist_clip)

    norm_all = not norm_mode.startswith("?")
    mode = norm_mode.lstrip("?")

    if loss_in_log == "before":
        gt_pts1 = apply_log_to_norm(gt_pts1)
        gt_pts2 = apply_log_to_norm(gt_pts2)

    pr_pts1 = jnp.asarray(get_pred_pts3d(pred1, use_pose=False))
    pr_pts2 = jnp.asarray(get_pred_pts3d(pred2, use_pose=True))

    B = valid1.shape[0]
    if norm_all:
        norm_sel = jnp.ones((B,), bool)
    else:
        is_metric = jnp.asarray(gt1["is_metric_scale"])
        if max_metric_scale:
            d1 = jnp.where(valid1, jnp.linalg.norm(gt_pts1, axis=-1),
                           0.0).reshape(B, -1)
            d2 = jnp.where(valid2, jnp.linalg.norm(gt_pts2, axis=-1),
                           0.0).reshape(B, -1)
            is_metric = (is_metric & (d1.max(axis=-1) < max_metric_scale)
                         & (d2.max(axis=-1) < max_metric_scale))
        norm_sel = ~is_metric

    if mode:
        # per-sample factors: computing on the full batch and selecting
        # rows equals the reference's subset normalization (:88-97)
        n1, n2, pr_f = normalize_pointcloud(pr_pts1, pr_pts2, mode,
                                            valid1, valid2)
        sel = norm_sel[:, None, None, None]
        pr_pts1 = jnp.where(sel, n1, pr_pts1)
        pr_pts2 = jnp.where(sel, n2, pr_pts2)
        if not gt_scale:
            gt_pts1, gt_pts2, gt_f = normalize_pointcloud(
                gt_pts1, gt_pts2, mode, valid1, valid2)
            gt_f4 = gt_f[:, None, None, None]
            pr_pts1 = jnp.where(sel, pr_pts1, pr_pts1 / gt_f4)
            pr_pts2 = jnp.where(sel, pr_pts2, pr_pts2 / gt_f4)

    if loss_in_log and loss_in_log != "before":
        pr_pts1, gt_pts1 = apply_log_to_norm(pr_pts1), apply_log_to_norm(gt_pts1)
        pr_pts2, gt_pts2 = apply_log_to_norm(pr_pts2), apply_log_to_norm(gt_pts2)

    l1 = jnp.linalg.norm(pr_pts1 - gt_pts1, axis=-1)
    l2 = jnp.linalg.norm(pr_pts2 - gt_pts2, axis=-1)
    mask1, mask2 = valid1, valid2
    if sky_loss_value > 0:
        sky1 = jnp.asarray(gt1["sky_mask"]) & ~valid1
        sky2 = jnp.asarray(gt2["sky_mask"]) & ~valid2
        mask1 = valid1 | sky1
        mask2 = valid2 | sky2
        l1 = jnp.where(sky1, sky_loss_value, l1)
        l2 = jnp.where(sky2, sky_loss_value, l2)
    return l1, l2, mask1, mask2


def mast3r_conf_regr3d_loss(
    gt1, gt2, pred1, pred2,
    alpha: float = 0.2,
    norm_mode: str = "?avg_dis",
    gt_scale: bool = False,
    dist_clip: Optional[float] = None,
    sky_loss_value: float = 2.0,
    max_metric_scale: float = 0.0,
    loss_in_log=False,
) -> Tuple[Array, Dict[str, Array]]:
    """ConfLoss(mast3r Regr3D(L21, '?avg_dis'), alpha=0.2) — the MASt3R
    pretraining regression term (their train recipe pairs it with
    ConfMatchingLoss, see gd3d/ops/matching_loss.py)."""
    l1, l2, mask1, mask2 = mast3r_regr3d_maps(
        gt1, gt2, pred1, pred2, norm_mode, gt_scale, dist_clip,
        sky_loss_value, max_metric_scale, loss_in_log)
    c1, c2 = pred1["conf"], pred2["conf"]
    cl1 = masked_mean(l1 * c1 - alpha * jnp.log(c1), mask1)
    cl2 = masked_mean(l2 * c2 - alpha * jnp.log(c2), mask2)
    return cl1 + cl2, {
        "conf_loss_1": cl1, "conf_loss2": cl2,
        "Regr3D_pts3d_1": masked_mean(l1, mask1),
        "Regr3D_pts3d_2": masked_mean(l2, mask2),
    }
