"""Multiview-equivariance (MEF) fine-tune step — the teacher-free baseline.

Parity target: src/finetune_timm_me.py:191-220. Per pair of rendered views
with ground-truth keypoints: student descriptors at keypoints (through
refine_conv), smooth-AP loss with positives from 3D distance < 5e-3 and
negatives > 0.1.

The step is a pure function jitted over a data-parallel mesh: batch sharded
on the `data` axis, params/optimizer replicated; XLA inserts the gradient
all-reduce (the TPU-native analogue of Lightning DDP, src/main.py:147-161).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import optax

from gd3d.core.config import DistillConfig
from gd3d.distill.train_state import TrainState
from gd3d.models.student import Student, merge_params
from gd3d.ops.losses import ap_loss_me


def build_me_train_step(
    student: Student, cfg: DistillConfig, tx: optax.GradientTransformation
) -> Callable[[TrainState, dict, dict], Tuple[TrainState, dict]]:
    kcfg = cfg.keypoints

    def loss_fn(trainable, frozen, batch):
        params = merge_params(trainable, frozen)
        desc_1 = student.get_feature(
            params, batch["rgb_1"], batch["pts2d_1"], normalize=True
        )
        desc_2 = student.get_feature(
            params, batch["rgb_2"], batch["pts2d_2"], normalize=True
        )
        loss, overflow = ap_loss_me(
            desc_1,
            desc_2,
            batch["pts3d_1"],
            batch["pts3d_2"],
            valid_1=batch.get("valid_1"),
            valid_2=batch.get("valid_2"),
            thresh3d_pos=kcfg.thresh3d_pos,
            thres3d_neg=kcfg.thres3d_neg,
            temp=kcfg.ap_sigmoid_temp,
            return_overflow=True,
        )
        # ap_pos_overflow > 0 means the static max_pos cap truncated
        # positives (reference is unbounded, finetune_timm_me.py:199-217)
        return loss, {"loss": loss, "ap_pos_overflow": overflow}

    def train_step(state: TrainState, frozen, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable, frozen, batch
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        return (
            TrainState(
                step=state.step + 1, trainable=trainable, opt_state=opt_state
            ),
            metrics,
        )

    return train_step
