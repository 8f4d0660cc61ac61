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


def test_synthetic_pretrain_batch_geometry():
    """Dense GT is 3D-consistent: valid pixels of both views unproject to
    the SAME world-frame object surface, and correspondences land on
    nearby world points."""
    from gd3d.data.pretrain_pairs import synthetic_pretrain_batch

    b = synthetic_pretrain_batch(seed=1, batch=2, img=64, n_corres=32)
    assert b["img1"].shape == (2, 64, 64, 3)
    assert b["img1"].min() >= -1 and b["img1"].max() <= 1
    g1, g2 = b["gt1"], b["gt2"]
    assert g1["pts3d"].shape == (2, 64, 64, 3)
    # camera_pose is cam2world: unprojected points must sit near origin
    # (objects are centered there by the renderer)
    for g in (g1, g2):
        m = g["valid_mask"]
        assert m.any()
        pts = g["pts3d"][m]
        assert np.abs(pts).max() < 1.0, "world points should hug the object"
        # sky is exactly the complement of valid
        np.testing.assert_array_equal(g["sky_mask"], ~g["valid_mask"])
    # valid correspondences: both views' pixels unproject to ~the same
    # world point (same mesh vertex seen from two cameras)
    vc = g1["valid_corres"]
    assert vc.any()
    for bi in range(2):
        c1 = g1["corres"][bi][vc[bi]]
        c2 = g2["corres"][bi][vc[bi]]
        w1 = g1["pts3d"][bi][c1[:, 1], c1[:, 0]]
        w2 = g2["pts3d"][bi][c2[:, 1], c2[:, 0]]
        d = np.linalg.norm(w1 - w2, axis=-1)
        assert np.median(d) < 0.05, d


def test_rendered_pretrain_batch_geometry(tmp_path):
    """The on-disk render-tree loader produces the same 3D-consistent GT
    as the in-process path: both views' valid pixels unproject to the
    shared object, correspondences land on nearby world points."""
    from gd3d.data.pretrain_pairs import rendered_pretrain_batch
    from gd3d.data.render_synthetic import render_object_tree

    poses = render_object_tree(str(tmp_path), ["a", "b"], n_views=4,
                               size=96)
    np.save(tmp_path / "obj_poses.npy", poses)

    b = rendered_pretrain_batch(tmp_path, seed=2, batch=2, img=64,
                                n_corres=32)
    assert b["img1"].shape == (2, 64, 64, 3)
    g1, g2 = b["gt1"], b["gt2"]
    for g in (g1, g2):
        assert g["valid_mask"].any()
        assert np.abs(g["pts3d"][g["valid_mask"]]).max() < 1.0
        np.testing.assert_array_equal(g["sky_mask"], ~g["valid_mask"])
    vc = g1["valid_corres"]
    assert vc.any()
    for bi in range(2):
        c1 = g1["corres"][bi][vc[bi]]
        c2 = g2["corres"][bi][vc[bi]]
        w1 = g1["pts3d"][bi][c1[:, 1], c1[:, 0]]
        w2 = g2["pts3d"][bi][c2[:, 1], c2[:, 0]]
        d = np.linalg.norm(w1 - w2, axis=-1)
        assert np.median(d) < 0.05, d


@pytest.mark.slow
def test_pretrain_cli_smoke(tmp_path):
    import json

    from gd3d.cli.pretrain import main

    main(["--output", str(tmp_path / "run"), "--steps", "2", "--tiny",
          "--img", "64", "--corres", "16", "--warmup", "1"])
    lines = [json.loads(l) for l in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 2 and np.isfinite(lines[-1]["loss"])
    # warmup-cosine schedule: lr ramps 0 -> peak over the warmup step
    assert lines[0]["lr"] == 0.0 and lines[1]["lr"] > 0
    assert (tmp_path / "run" / "params_final.npz").exists()


@pytest.mark.slow
def test_pretrain_cli_resume_reproduces_metrics(tmp_path):
    """4 straight steps vs 2 steps + kill + resume: the step-2..3 metric
    stream must be identical (batches are seeded per step; state_last.npz
    carries params + optimizer state + step)."""
    import json

    from gd3d.cli.pretrain import main

    common = ["--steps", "4", "--tiny", "--img", "64", "--corres", "16",
              "--warmup", "2"]

    out_a = tmp_path / "straight"
    main(["--output", str(out_a)] + common)

    out_b = tmp_path / "resumed"
    main(["--output", str(out_b), "--steps", "2"] + common[2:]
         + ["--ckpt-every", "2"])
    main(["--output", str(out_b)] + common
         + ["--resume", str(out_b / "state_last.npz")])

    def recs(path):
        return [json.loads(l) for l in
                (path / "metrics.jsonl").read_text().splitlines()]

    ra, rb = recs(out_a), recs(out_b)
    assert [r["step"] for r in ra] == [r["step"] for r in rb] == [0, 1, 2, 3]
    for a, b in zip(ra, rb):
        assert abs(a["loss"] - b["loss"]) < 1e-4, (a, b)


@pytest.mark.slow
def test_pretrain_step_dp_mesh_matches_single_device():
    """DP over the 8-device CPU mesh reproduces the single-device step:
    params/opt_state replicated, batch sharded on `data`, XLA inserts the
    gradient all-reduce."""
    from gd3d.core.mesh import make_mesh, replicated, shard_batch
    from gd3d.distill.pretrain import build_mast3r_pretrain_step

    cfg = Mast3rConfig(croco=TINY, local_feat_dim=6, dpt_feature_dim=32,
                       dpt_last_dim=16)
    model = Mast3r(cfg)
    batch = _batch(B=8, H=32, W=32, N=8, seed=3)
    params = model.init(jax.random.key(0), batch["img1"],
                        batch["img2"])["params"]
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    params_r = jax.device_put(params, replicated(mesh))
    opt_r = jax.device_put(opt_state, replicated(mesh))

    # the step donates its inputs, and device_put ALIASES the device-0
    # shard — give the single-device run its own buffers
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    p1, o1, m1 = build_mast3r_pretrain_step(model, tx)(
        copy(params), copy(opt_state), batch)
    step = build_mast3r_pretrain_step(model, tx, mesh=mesh)
    p2, o2, m2 = step(params_r, opt_r, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        # reduction-order noise through adamw's rsqrt: measured max
        # 1.4e-5 abs / 0.23% rel on 8 of 5.3M elements
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=3e-5)


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
