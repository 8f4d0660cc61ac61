"""DUSt3R/MASt3R pretraining step smoke: the composed
ConfLoss(Regr3D)+ConfMatchingLoss objective over the flax Mast3r model
optimizes end-to-end in one jitted program (criteria parity is covered
reference-direct in test_regr3d.py / test_matching_loss.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gd3d.models.croco import CrocoConfig
from gd3d.models.mast3r import Mast3r, Mast3rConfig

TINY = CrocoConfig(
    patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
    dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
)


def _batch(B=1, H=64, W=96, N=24, seed=0):
    rng = np.random.RandomState(seed)
    poses = []
    for _ in range(B):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        q *= np.sign(np.linalg.det(q))
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = q
        m[:3, 3] = rng.randn(3) * 0.1
        poses.append(m)

    def gt(seed2):
        r2 = np.random.RandomState(seed2)
        return {
            "camera_pose": np.stack(poses),
            "pts3d": (r2.randn(B, H, W, 3) * 0.3
                      + np.array([0, 0, 2.0])).astype(np.float32),
            "valid_mask": r2.rand(B, H, W) > 0.2,
            "sky_mask": r2.rand(B, H, W) > 0.9,
            "is_metric_scale": np.zeros((B,), bool),
        }

    gt1 = gt(seed + 1)
    gt2 = gt(seed + 2)
    gt1["corres"] = np.stack([rng.randint(0, W, (B, N)),
                              rng.randint(0, H, (B, N))], -1)
    gt2["corres"] = np.stack([rng.randint(0, W, (B, N)),
                              rng.randint(0, H, (B, N))], -1)
    gt1["valid_corres"] = rng.rand(B, N) > 0.2
    return {
        "img1": jnp.asarray(rng.rand(B, H, W, 3) * 2 - 1, jnp.float32),
        "img2": jnp.asarray(rng.rand(B, H, W, 3) * 2 - 1, jnp.float32),
        "gt1": {k: jnp.asarray(v) for k, v in gt1.items()},
        "gt2": {k: jnp.asarray(v) for k, v in gt2.items()},
    }


@pytest.mark.slow
def test_pretrain_step_optimizes():
    from gd3d.distill.pretrain import build_mast3r_pretrain_step

    model = Mast3r(Mast3rConfig(croco=TINY, local_feat_dim=6,
                                dpt_feature_dim=32, dpt_last_dim=16))
    batch = _batch()
    params = model.init(jax.random.key(0), batch["img1"], batch["img2"])[
        "params"]
    # grad clipping as the reference trains with (Trainer grad_clip 1.0);
    # without it the -alpha*log(conf) term blows the exp conf head up
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    opt_state = tx.init(params)
    step = build_mast3r_pretrain_step(model, tx)

    losses = []
    for _ in range(6):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # same batch repeated: Adam must reduce the composed objective
    assert losses[-1] < losses[0], losses
    assert float(metrics["regr3d"]) > 0
    # matching term is live (not masked to zero)
    assert np.isfinite(float(metrics["matching"]))


@pytest.mark.slow
def test_pretrain_loss_details_and_weights():
    from gd3d.distill.pretrain import pretrain_loss

    model = Mast3r(Mast3rConfig(croco=TINY, local_feat_dim=6,
                                dpt_feature_dim=32, dpt_last_dim=16))
    batch = _batch(seed=3)
    params = model.init(jax.random.key(1), batch["img1"], batch["img2"])[
        "params"]
    loss, details = pretrain_loss(model, params, batch)
    np.testing.assert_allclose(
        float(loss),
        float(details["regr3d"]) + 0.075 * float(details["matching"]),
        rtol=1e-6)
    # zero matching weight drops the matching term
    loss0, _ = pretrain_loss(model, params, batch, matching_weight=0.0)
    np.testing.assert_allclose(float(loss0), float(details["regr3d"]),
                               rtol=1e-6)
