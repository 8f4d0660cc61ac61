"""Train state + optimizer for adapter-only fine-tuning.

The reference optimizes only LoRA A/B, refine_conv, depth head and adapters
with AdamW(lr 1e-5, wd 1e-4) under grad-clip 1.0
(src/finetune_timm_mast3r.py:683-689, src/main.py:152). Here the optimizer
state covers exactly the trainable sub-tree (frozen leaves are None nodes),
so there is no analogue of DDP's find_unused_parameters — XLA's all-reduce
only ever sees adapter grads.
"""
from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax

from gd3d.core.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    trainable: Any
    opt_state: Any


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=cfg.lr,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.weight_decay,
        ),
    )
    if cfg.grad_accum > 1:
        # accumulate_grad_batches (finetune_timm_mast3r.py:759)
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.grad_accum)
    return tx


def init_state(tx: optax.GradientTransformation, trainable) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        trainable=trainable,
        opt_state=tx.init(trainable),
    )
