"""DUSt3R/MASt3R PRETRAINING step (as opposed to the repo's distillation
steps): ConfLoss(Regr3D) regression + ConfMatchingLoss(InfoNCE) matching
over the flax Mast3r two-view model.

The reference vendors the loss classes (mast3r/losses.py, dust3r/losses.py)
but strips the pretraining driver; loss-weight defaults here follow the
public MASt3R train recipe (ConfLoss(Regr3D(L21, '?avg_dis'), alpha=0.2)
+ 0.075 * ConfMatchingLoss(MatchingLoss(InfoNCE(mode='proper')),
alpha=10)), which is not in-tree — override freely. The criteria
themselves are reference-direct parity-tested (test_regr3d.py,
test_matching_loss.py).

TPU-first: one jitted step; static batch shapes; correspondences arrive
pre-padded to a fixed N with a validity mask (the reference's collate
produces ragged lists); the whole update is donate-able.

Batch layout (all numpy/jnp, B pairs):
  img1, img2        (B, H, W, 3) in [-1, 1]
  gt1/gt2:
    camera_pose     (B, 4, 4)
    pts3d           (B, H, W, 3)  world frame
    valid_mask      (B, H, W)
    sky_mask        (B, H, W)     optional (zeros if absent)
    is_metric_scale (B,)          optional (False if absent)
    corres          (B, N, 2)     int x,y in view pixels
  gt1.valid_corres  (B, N)
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gd3d.ops.matching_loss import conf_matching_loss
from gd3d.ops.regr3d import mast3r_conf_regr3d_loss


def pretrain_loss(
    model, params, batch: Dict[str, Any],
    alpha_regr: float = 0.2,
    alpha_match: float = 10.0,
    matching_weight: float = 0.075,
    norm_mode: str = "?avg_dis",
    infonce_mode: str = "proper",
    infonce_temperature: float = 0.07,
    sky_loss_value: float = 2.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Two-view pretraining loss. The model's symmetrized 2B output batch
    is sliced to the [img1->view1, img2->view2] direction (element order
    documented at gd3d/models/mast3r.py::__call__); the mirrored direction
    is already covered by the dataset's pair symmetrization, as in the
    reference's pairloader."""
    B = batch["img1"].shape[0]
    out = model.apply({"params": params}, batch["img1"], batch["img2"])
    # direction where view1 = img1 is the second half of the 2B stack
    res1 = {k: v[B:] for k, v in out["res1"].items()}
    res2 = {k: v[B:] for k, v in out["res2"].items()
            if k != "tgt_attn_map"}

    gt1 = dict(batch["gt1"])
    gt2 = dict(batch["gt2"])
    H, W = batch["img1"].shape[1:3]
    gt1.setdefault("sky_mask", jnp.zeros((B, H, W), bool))
    gt2.setdefault("sky_mask", jnp.zeros((B, H, W), bool))
    gt1.setdefault("is_metric_scale", jnp.zeros((B,), bool))

    regr, regr_details = mast3r_conf_regr3d_loss(
        gt1, gt2, res1, res2, alpha=alpha_regr, norm_mode=norm_mode,
        sky_loss_value=sky_loss_value)
    match, match_details = conf_matching_loss(
        gt1, gt2, res1, res2, alpha=alpha_match, confmode="mean",
        temperature=infonce_temperature, mode=infonce_mode)
    loss = regr + matching_weight * match
    details = {"loss": loss, "regr3d": regr, "matching": match}
    details.update({f"regr/{k}": v for k, v in regr_details.items()})
    details.update({f"match/{k}": v for k, v in match_details.items()})
    return loss, details


def build_croco_pretrain_step(
    model, tx,
    norm_pix_loss: bool = False,
    mesh=None,
):
    """CroCo pretraining step (masked cross-view completion, MaskedMSE) —
    same contract as :func:`build_mast3r_pretrain_step`. `model` is a
    gd3d.models.croco_pretrain.CrocoPretrain; the batch dict carries
    img1/img2 (B, H, W, 3) in [-1, 1] plus a precomputed mask1 (B, N)
    bool from croco_pretrain.random_mask (host-side rng keeps the step
    signature identical across objectives)."""
    from gd3d.models.croco_pretrain import masked_mse

    def step(params, opt_state, batch):
        def loss_fn(p):
            pred, target = model.apply(
                {"params": p}, batch["img1"], batch["img2"], batch["mask1"]
            )
            return masked_mse(pred, batch["mask1"], target,
                              norm_pix_loss=norm_pix_loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gd3d.core.mesh import DATA_AXIS

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, repl, NamedSharding(mesh, P(DATA_AXIS))),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1))


def build_mast3r_pretrain_step(
    model, tx,
    loss_kwargs: Optional[Dict[str, Any]] = None,
    mesh=None,
):
    """Returns jitted `step(params, opt_state, batch) -> (params,
    opt_state, metrics)` running the full fwd/bwd + optimizer update as
    one XLA program. `tx` is any optax transform.

    With `mesh` (a jax.sharding.Mesh from gd3d.core.mesh.make_mesh) the
    step is data-parallel: params/opt_state replicated, the batch sharded
    over the `data` axis, gradient all-reduce inserted by XLA over ICI —
    the same DP regime as the distillation trainers (the reference scales
    pretraining with Lightning DDP; this is the mesh equivalent).
    Callers shard batches with gd3d.core.mesh.shard_batch.
    """
    kw = dict(loss_kwargs or {})

    def step(params, opt_state, batch):
        (loss, details), grads = jax.value_and_grad(
            lambda p: pretrain_loss(model, p, batch, **kw), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, details

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    from jax.sharding import NamedSharding, PartitionSpec as P

    from gd3d.core.mesh import DATA_AXIS

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, repl, NamedSharding(mesh, P(DATA_AXIS))),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1))
