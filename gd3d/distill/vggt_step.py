"""VGGT -> CLIP-ViT distillation training step.

Parity target: FinetuneVGGTTIMM.training_step
(src/finetune_timm_vggt.py:577-648) —
  1. frozen VGGT inference: aggregator cost volumes, camera->extri/intri,
     depth maps, depth-unprojected world point maps
  2. keypoints: co-view masks -> NMS sampling on view-1 confidence ->
     track-head correspondence to view 2 -> border filter
  3. losses: L1 depth-diff + pairwise ranking on VGGT depth maps, co-view
     masked cost-volume KL (student cost at the /14-grid, plain softmax then
     row-normalized like the teacher's — finetune_timm_vggt.py:519-533),
     smooth-AP on world-point distances. All weights 1.0.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gd3d.core.config import DistillConfig
from gd3d.distill.train_state import TrainState
from gd3d.kernels.cost_kl import masked_softmax_kl_rows
from gd3d.models.student import Student, merge_params, resize_bilinear
from gd3d.ops.basic import l2_normalize
from gd3d.ops.geometry import extract_kp_depth
from gd3d.ops.losses import (
    _masked_mean,
    ap_loss_paired,
)
from gd3d.ops.masks import masked_patch_cost
from gd3d.teachers.vggt import VggtTeacher


def _nearest_downsample_mask(mask: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    """F.interpolate(mode='nearest') of a bool (H, W) mask to (ph, pw)."""
    H, W = mask.shape
    ys = (jnp.arange(ph) * (H / ph)).astype(jnp.int32)
    xs = (jnp.arange(pw) * (W / pw)).astype(jnp.int32)
    return mask[ys][:, xs]


def vggt_distill_loss(
    student: Student,
    teacher: VggtTeacher,
    cfg: DistillConfig,
    params: dict,
    teacher_params: dict,
    batch: Dict[str, jnp.ndarray],
    temperature,
    rng: jax.Array,
    return_aux: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch: rgb_1/rgb_2 (B, Hr, Wr, 3) [0,1]; rgb_vggt (B, 2, H, W, 3).

    return_aux=True adds metrics["aux"] with the per-loss intermediates for
    the reference-direct loss parity suite (see mast3r_step.py); never set
    in the train step."""
    kcfg = cfg.keypoints
    B, S, H, W, _ = batch["rgb_vggt"].shape
    vp = teacher.cfg.patch_size
    ph, pw = H // vp, W // vp

    tdtype = cfg.teacher_dtype if cfg.teacher_dtype != "float32" else None
    # one aggregator pass: features AND the token subset the track head
    # needs (the round-1 step re-ran the whole 1B trunk inside
    # sample_keypoints — 2x teacher cost)
    feats, track_tokens = teacher.extract_features(
        teacher_params, batch["rgb_vggt"], temperature, dtype=tdtype,
        return_track_tokens=True,
    )
    kp_1, kp_2, valid, mask_1, mask_2 = teacher.sample_keypoints(
        teacher_params, feats, batch["rgb_vggt"], rng,
        num_keypoints=kcfg.nms_num, min_distance=kcfg.nms_min_distance,
        border=kcfg.border, temperature=temperature,
        track_tokens=track_tokens,
    )
    kp_1 = jax.lax.stop_gradient(kp_1)
    kp_2 = jax.lax.stop_gradient(kp_2)

    rgb_1_resized = resize_bilinear(batch["rgb_1"], (H, W))
    rgb_2_resized = resize_bilinear(batch["rgb_2"], (H, W))

    # depth losses on the VGGT depth maps (finetune_timm_vggt.py:465-486);
    # one fused forward over both stacked views yields matching descriptors
    # AND intermediate keypoint features.
    desc_all, kp_feat_all = student.get_feature_and_intermediates(
        params,
        jnp.concatenate([rgb_1_resized, rgb_2_resized], axis=0),
        jnp.concatenate([kp_1, kp_2], axis=0),
        n=(4, 5, 6, 7),
    )
    desc_1, desc_2 = desc_all[:B], desc_all[B:]
    kp_feat_1, kp_feat_2 = kp_feat_all[:B], kp_feat_all[B:]
    kp_depth_1 = jax.vmap(
        lambda d, kp: extract_kp_depth(d, kp[None], kcfg.depth_window)[0]
    )(feats["depth_pred_1"], kp_1)
    kp_depth_2 = jax.vmap(
        lambda d, kp: extract_kp_depth(d, kp[None], kcfg.depth_window)[0]
    )(feats["depth_pred_2"], kp_2)

    pred_depth_diff = student.depth_diff(params, kp_feat_1 - kp_feat_2)
    gt_diff = jax.lax.stop_gradient(jnp.tanh(kp_depth_1 - kp_depth_2))
    depth_loss = _masked_mean(jnp.abs(pred_depth_diff - gt_diff), valid)

    # fused Pallas pairwise-ranking on TPU, jnp score_diff path elsewhere
    intra_depth_loss = student.intra_depth_loss(
        params, kp_feat_all,
        jnp.concatenate([kp_depth_1, kp_depth_2], axis=0),
        jnp.concatenate([valid, valid], axis=0),
        kcfg.depth_rank_threshold,
    )

    # cost KL at the /14 grid (finetune_timm_vggt.py:488-533)
    fc_all = student.get_feature_cost_vggt(
        params, jnp.concatenate([rgb_1_resized, rgb_2_resized], axis=0), vp
    )
    fc_1, fc_2 = fc_all[:B], fc_all[B:]
    hw = ph * pw
    fc_1 = l2_normalize(fc_1.reshape(B, hw, -1), axis=-1)
    fc_2 = l2_normalize(fc_2.reshape(B, hw, -1), axis=-1)
    cost_12 = jnp.einsum("bnc,bmc->bnm", fc_1, fc_2)
    cost_21 = jnp.einsum("bnc,bmc->bnm", fc_2, fc_1)

    mp_1 = jax.vmap(lambda m: _nearest_downsample_mask(m, ph, pw).reshape(-1))(
        mask_1
    )
    mp_2 = jax.vmap(lambda m: _nearest_downsample_mask(m, ph, pw).reshape(-1))(
        mask_2
    )

    def rownorm(c, m):
        return masked_patch_cost(c[None], m)[0]

    # Student side fused (softmax + clamp + per-row KL in one Pallas pass,
    # gd3d/kernels/cost_kl.py; jnp fallback off-TPU). Equivalence to the
    # reference chain (softmax -> get_masked_patch_cost row-norm -> KL,
    # finetune_timm_vggt.py:519-533): a masked-IN row's post-softmax
    # row-norm divides by an exact row-sum of 1, and a masked-OUT row
    # contributes exactly 0 (both maps clamp 0 -> eps), reproduced here by
    # masking the kernel's per-row output; the mean keeps the reference's
    # all-rows denominator.
    t_1 = jax.vmap(rownorm)(feats["cost_1"], mp_1)
    t_2 = jax.vmap(rownorm)(feats["cost_2"], mp_2)
    kl_rows_1 = masked_softmax_kl_rows(t_1, cost_12, mp_1) * mp_1
    kl_rows_2 = masked_softmax_kl_rows(t_2, cost_21, mp_2) * mp_2
    kl_loss = (jnp.mean(kl_rows_1) + jnp.mean(kl_rows_2)) / 2.0

    # matching AP on world points (finetune_timm_vggt.py:536-575);
    # descriptors from the fused forwards above.
    def gather_pts(pts3d, kp):
        x = jnp.clip(kp[:, 0].astype(jnp.int32), 0, W - 1)
        y = jnp.clip(kp[:, 1].astype(jnp.int32), 0, H - 1)
        return pts3d[y, x]

    pts3d_1 = jax.vmap(gather_pts)(feats["point_map_view_1"], kp_1)
    pts3d_2 = jax.vmap(gather_pts)(feats["point_map_view_2"], kp_2)
    ap_loss = ap_loss_paired(
        desc_1, desc_2, pts3d_1, pts3d_2, valid,
        thres3d_neg=kcfg.thres3d_neg, temp=kcfg.ap_sigmoid_temp,
        # finetune_timm_vggt.py:556 kept the pre-correction rpos formula
        # (sigmoid(1-pos_sim)+1) that the MASt3R module replaced
        legacy_rpos1=True,
    )

    w = cfg.loss_weights
    loss = (
        w.ap * ap_loss
        + w.depth * depth_loss
        + w.intra_depth * intra_depth_loss
        + w.kl * kl_loss
    )
    metrics = {
        "loss": loss,
        "ap_loss": ap_loss,
        "depth_loss": depth_loss,
        "intra_depth_loss": intra_depth_loss,
        "kl_loss": kl_loss,
        "num_kps": jnp.sum(valid.astype(jnp.float32)) / B,
    }
    if return_aux:
        metrics["aux"] = {
            "kp_1": kp_1, "kp_2": kp_2, "valid": valid,
            "mask_1": mask_1, "mask_2": mask_2,
            "depth_pred_1": feats["depth_pred_1"],
            "depth_pred_2": feats["depth_pred_2"],
            "kp_feat_1": kp_feat_1, "kp_feat_2": kp_feat_2,
            "kp_depth_1": kp_depth_1, "kp_depth_2": kp_depth_2,
            "desc_1": desc_1, "desc_2": desc_2,
            # raw (pre-L2-norm) /14-grid cost features: the reference's
            # calculate_cost_loss normalizes/bmms/softmaxes itself
            "fc_1_raw": fc_all[:B], "fc_2_raw": fc_all[B:],
            "teacher_cost_1": feats["cost_1"],
            "teacher_cost_2": feats["cost_2"],
            "point_map_view_1": feats["point_map_view_1"],
            "point_map_view_2": feats["point_map_view_2"],
        }
    return loss, metrics


def build_vggt_train_step(
    student: Student,
    teacher: VggtTeacher,
    cfg: DistillConfig,
    tx: optax.GradientTransformation,
) -> Callable:
    def train_step(state: TrainState, frozen, teacher_params, batch,
                   temperature, rng):
        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            return vggt_distill_loss(
                student, teacher, cfg, params, teacher_params, batch,
                temperature, rng,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(step=state.step + 1, trainable=trainable,
                       opt_state=opt_state),
            metrics,
        )

    return train_step


def build_vggt_train_multistep(
    student: Student,
    teacher: VggtTeacher,
    cfg: DistillConfig,
    tx: optax.GradientTransformation,
) -> Callable:
    """K optimizer steps per dispatch: lax.scan over a (K, ...) batch stack.

    Same dispatch-amortization as build_mast3r_train_multistep (~40-60 ms of
    tunnel/host overhead per dispatch is paid once per K pairs). The NMS
    tie-break rng is folded per scan slice so every step samples fresh
    keypoints, matching K sequential train_step calls."""
    step = build_vggt_train_step(student, teacher, cfg, tx)

    def multi_step(state, frozen, teacher_params, batches, temperature, rng):
        rngs = jax.random.split(rng, jax.tree_util.tree_leaves(batches)[0].shape[0])

        def body(s, slice_):
            batch, key = slice_
            s, metrics = step(s, frozen, teacher_params, batch, temperature,
                              key)
            return s, metrics

        return jax.lax.scan(body, state, (batches, rngs))

    return multi_step
