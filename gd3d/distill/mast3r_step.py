"""MASt3R -> CLIP-ViT distillation training step (the flagship path).

Parity target: FinetuneMASt3RTIMM.training_step
(src/finetune_timm_mast3r.py:592-680) —
  1. frozen MASt3R symmetric inference (attn-map cost volumes, descs, pts3d)
  2. reciprocal-NN keypoint matching + border/conf filtering
  3. depth maps from the batch (objaverse) or rasterized from the teacher
     point cloud + post-processing (scannetpp)
  4. losses: L1 depth-diff + pairwise logistic ranking (intra-depth), masked
     cost-volume KL, smooth-AP matching; weighted sum
  5. AdamW on the adapter-only trainable tree, grad-clip 1.0.

Static-shape design: G = (H/16)*(W/16) keypoint slots with validity masks
(the reference's dynamic filtering becomes masking); the whole step is ONE
XLA program per (dataset geometry, has_depth) combination. The teacher's
attention temperature is a runtime scalar (per-epoch schedule,
finetune_timm_mast3r.py:217-227) so annealing never recompiles.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gd3d.core.config import DistillConfig
from gd3d.distill.keypoints import filter_and_match_keypoints
from gd3d.kernels.cost_kl import masked_softmax_kl_rows
from gd3d.distill.train_state import TrainState
from gd3d.models.student import Student, merge_params, resize_bilinear
from gd3d.ops.basic import l2_normalize
from gd3d.ops.depth import post_process_depth
from gd3d.ops.geometry import extract_kp_depth, point_cloud_to_depth
from gd3d.ops.losses import (
    _masked_mean,
    ap_loss_paired,
)
from gd3d.ops.masks import masked_patch_cost, patch_mask_from_kps
from gd3d.teachers.mast3r import Mast3rTeacher


def mast3r_distill_loss(
    student: Student,
    teacher: Mast3rTeacher,
    cfg: DistillConfig,
    params: dict,
    teacher_params: dict,
    batch: Dict[str, jnp.ndarray],
    temperature,
    has_depth: bool,
    return_aux: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss for a batch of B pairs. Batch keys (all NHWC, float32):
      rgb_1/rgb_2 (B, Hr, Wr, 3) in [0,1]; rgb_mast3r_1/2 (B, H, W, 3) in
      [-1,1] with W >= H; intrinsic (B, 3, 3); depth_1/depth_2 (B, Hd, Wd)
      when has_depth.

    return_aux=True adds metrics["aux"]: the intermediate tensors each loss
    consumes (keypoints, depth maps, student features/descs, raw cost maps,
    teacher maps), so the reference-direct loss parity suite
    (tests/test_reference_loss_parity.py) can drive the ACTUAL reference
    calculate_{depth,cost,matching}_loss on identical inputs. Never set in
    the train step.
    """
    kcfg = cfg.keypoints
    ps = cfg.student.patch_size
    B, H, W, _ = batch["rgb_mast3r_1"].shape

    # 1. frozen teacher (trunk dtype per cfg.teacher_dtype policy)
    tdtype = cfg.teacher_dtype if cfg.teacher_dtype != "float32" else None
    feats = teacher.extract_features(
        teacher_params, batch["rgb_mast3r_1"], batch["rgb_mast3r_2"],
        temperature, dtype=tdtype,
    )

    # 2. keypoints (per pair)
    def kp_one(desc1, desc2, conf1, conf2):
        return filter_and_match_keypoints(
            {"desc_1": desc1, "desc_2": desc2, "conf_1": conf1, "conf_2": conf2},
            H, W,
            subsample=kcfg.nn_subsample,
            border=kcfg.border,
            min_conf_percent=kcfg.min_conf_percentile,
        )

    kp_1, kp_2, valid = jax.vmap(kp_one)(
        feats["desc_1"], feats["desc_2"], feats["conf_1"], feats["conf_2"]
    )
    kp_1 = jax.lax.stop_gradient(kp_1)
    kp_2 = jax.lax.stop_gradient(kp_2)

    rgb_1_resized = resize_bilinear(batch["rgb_1"], (H, W))
    rgb_2_resized = resize_bilinear(batch["rgb_2"], (H, W))

    # depth maps (finetune_timm_mast3r.py:617-633)
    if has_depth:
        d1 = batch["depth_1"]
        d2 = batch["depth_2"]
        if d1.shape[-2:] != (H, W):
            d1 = resize_bilinear(d1[..., None], (H, W))[..., 0]
            d2 = resize_bilinear(d2[..., None], (H, W))[..., 0]
        depth_1, depth_2 = d1, d2
    else:
        def raster(pts3d, K):
            d = point_cloud_to_depth(pts3d.reshape(-1, 3), K, W, H)
            return post_process_depth(d, kernel_size=3)

        depth_1 = jax.vmap(raster)(feats["pts3d_1"], batch["intrinsic"])
        depth_2 = jax.vmap(raster)(feats["pts3d_2"], batch["intrinsic"])

    # 3. depth losses (finetune_timm_mast3r.py:472-501). ONE fused forward
    # over both views stacked on batch yields the matching descriptors
    # (loss 5) AND the intermediate keypoint features — identical numerics,
    # half the student subgraphs of the reference's 6 separate passes and a
    # 2B batch for the MXU.
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
    )(depth_1, kp_1)
    kp_depth_2 = jax.vmap(
        lambda d, kp: extract_kp_depth(d, kp[None], kcfg.depth_window)[0]
    )(depth_2, kp_2)

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

    # 4. cost-volume KL (finetune_timm_mast3r.py:504-540); both views in one
    # cost forward
    fc_all = student.get_feature_cost(
        params, jnp.concatenate([rgb_1_resized, rgb_2_resized], axis=0),
        normalize=False,
    )
    fc_1, fc_2 = fc_all[:B], fc_all[B:]
    hw = (H // ps) * (W // ps)
    fc_1 = l2_normalize(fc_1.reshape(B, hw, -1), axis=-1)
    fc_2 = l2_normalize(fc_2.reshape(B, hw, -1), axis=-1)
    cost_12 = jnp.einsum("bnc,bmc->bnm", fc_1, fc_2)
    cost_21 = jnp.einsum("bnc,bmc->bnm", fc_2, fc_1)

    def mask_one(kp, v):
        return patch_mask_from_kps(kp, H, W, ps, valid=v)

    mask_1 = jax.vmap(mask_one)(kp_1, valid)
    mask_2 = jax.vmap(mask_one)(kp_2, valid)

    mcost_t1 = jax.vmap(lambda c, m: masked_patch_cost(c[None], m)[0])(
        feats["cost_1"], mask_1
    )
    mcost_t2 = jax.vmap(lambda c, m: masked_patch_cost(c[None], m)[0])(
        feats["cost_2"], mask_2
    )
    # student side fused: masked softmax + per-row KL in one Pallas kernel
    # (gd3d/kernels/cost_kl.py; falls back to the jnp path off-TPU)
    kl_loss = (
        jnp.mean(masked_softmax_kl_rows(mcost_t1, cost_12, mask_1))
        + jnp.mean(masked_softmax_kl_rows(mcost_t2, cost_21, mask_2))
    ) / 2.0

    # 5. matching AP loss (finetune_timm_mast3r.py:543-589); desc_1/desc_2
    # come from the fused forwards above.
    def gather_pts(pts3d, kp):
        x = jnp.clip(kp[:, 0].astype(jnp.int32), 0, W - 1)
        y = jnp.clip(kp[:, 1].astype(jnp.int32), 0, H - 1)
        return pts3d[y, x]

    pts3d_1 = jax.vmap(gather_pts)(feats["pts3d_1"], kp_1)
    pts3d_2 = jax.vmap(gather_pts)(feats["pts3d_2_from_1"], kp_2)
    ap_loss = ap_loss_paired(
        desc_1, desc_2, pts3d_1, pts3d_2, valid,
        thres3d_neg=kcfg.thres3d_neg, temp=kcfg.ap_sigmoid_temp,
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
            "depth_1": depth_1, "depth_2": depth_2,
            "kp_feat_1": kp_feat_1, "kp_feat_2": kp_feat_2,
            "kp_depth_1": kp_depth_1, "kp_depth_2": kp_depth_2,
            "desc_1": desc_1, "desc_2": desc_2,
            # raw (pre-L2-norm) cost features: the reference's
            # calculate_cost_loss normalizes/bmms/softmaxes itself
            "fc_1_raw": fc_all[:B], "fc_2_raw": fc_all[B:],
            "teacher_cost_1": feats["cost_1"],
            "teacher_cost_2": feats["cost_2"],
            "pts3d_1_map": feats["pts3d_1"],
            "pts3d_2_from_1_map": feats["pts3d_2_from_1"],
        }
    return loss, metrics


def build_mast3r_train_step(
    student: Student,
    teacher: Mast3rTeacher,
    cfg: DistillConfig,
    tx: optax.GradientTransformation,
    has_depth: bool,
) -> Callable:
    def train_step(state: TrainState, frozen, teacher_params, batch, temperature):
        def loss_fn(trainable):
            params = merge_params(trainable, frozen)
            return mast3r_distill_loss(
                student, teacher, cfg, params, teacher_params, batch,
                temperature, has_depth,
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


def build_mast3r_train_multistep(
    student: Student,
    teacher: Mast3rTeacher,
    cfg: DistillConfig,
    tx: optax.GradientTransformation,
    has_depth: bool,
) -> Callable:
    """K optimizer steps per dispatch: lax.scan over a (K, ...) batch stack.

    Amortizes per-step host dispatch/sync (one XLA program per K pairs); the
    metrics come back stacked (K,)."""
    step = build_mast3r_train_step(student, teacher, cfg, tx, has_depth)

    def multi_step(state, frozen, teacher_params, batches, temperature):
        def body(s, batch):
            s, metrics = step(s, frozen, teacher_params, batch, temperature)
            return s, metrics

        return jax.lax.scan(body, state, batches)

    return multi_step


def temperature_schedule(cfg: DistillConfig, epoch: int) -> float:
    """init -> final linear over max_epochs (finetune_timm_mast3r.py:217-224)."""
    t = cfg.train
    ratio = min(epoch / max(t.max_epochs, 1), 1.0)
    return t.init_temperature * (1 - ratio) + t.final_temperature * ratio
