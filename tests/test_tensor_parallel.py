"""Tensor-parallel validation on the virtual 8-CPU mesh (VERDICT.md item 2).

Three claims, each previously unproven:
  (a) apply_tp_sharding actually lands the qkv/MLP kernels sharded over the
      `model` axis (not silently replicated),
  (b) a student train step over a 4x2 DP x TP mesh produces the same loss
      and updated adapter params as the plain 1-device run,
  (c) the MASt3R and VGGT teacher forwards under TP match the 1-device run.

The reference has no TP (SURVEY.md §2.4); we add it for the 1B-param VGGT
aggregator (/root/reference/vggt/models/aggregator.py:249-323). XLA's SPMD
partitioner inserts the all-reduces over ICI from the param shardings alone.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gd3d.core.config import DistillConfig, StudentConfig
from gd3d.core.mesh import MODEL_AXIS, make_mesh, shard_batch
from gd3d.data.synthetic import synthetic_me_batch
from gd3d.distill import build_me_train_step, make_optimizer
from gd3d.distill.train_state import init_state
from gd3d.models.student import Student, split_params
from gd3d.parallel import apply_tp_sharding

STUDENT = StudentConfig(
    embed_dim=32,
    depth=4,
    num_heads=2,
    patch_size=8,
    pretrain_img_size=32,
    lora_start_block=2,
    use_adapters=True,
    adapter_bottleneck=8,
    target_res=32,
    depth_head_hidden=16,
)


def _mesh():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.devices.shape == (4, 2)
    return mesh


def _model_sharded_leaves(params):
    """(path, leaf) pairs whose sharding spec mentions the model axis."""
    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if leaf is None:
            continue
        spec = getattr(leaf.sharding, "spec", P())
        if any(MODEL_AXIS in str(s) for s in spec if s is not None):
            out.append(("/".join(str(getattr(k, "key", k)) for k in path), leaf))
    return out


def test_tp_rules_shard_the_heavy_kernels():
    student = Student(STUDENT)
    params = student.init(jax.random.key(0), img_size=32)
    mesh = _mesh()
    sharded = apply_tp_sharding(params, mesh)
    hits = _model_sharded_leaves(sharded)
    names = [n for n, _ in hits]
    assert any("qkv/kernel" in n for n in names), names
    assert any("fc1/kernel" in n for n in names), names
    assert any("fc2/kernel" in n for n in names), names
    assert any("proj/kernel" in n for n in names), names
    # the shards must actually be halved on the sharded dim
    for name, leaf in hits:
        shard = leaf.addressable_shards[0].data
        assert shard.size == leaf.size // 2, (name, leaf.shape, shard.shape)
    # and the values must be unchanged by the device_put
    ref = student.init(jax.random.key(0), img_size=32)
    a = jax.tree_util.tree_leaves(ref)
    b = jax.tree_util.tree_leaves(jax.device_get(sharded))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _me_setup():
    cfg = DistillConfig(teacher="me", dataset="synthetic", student=STUDENT)
    student = Student(cfg.student, me_interp_quirk=True)
    params = student.init(jax.random.key(0), img_size=32)
    trainable, frozen = split_params(params)
    tx = make_optimizer(cfg.train)
    step_fn = build_me_train_step(student, cfg, tx)
    return step_fn, tx, trainable, frozen


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_me_train_step_tp_matches_single_device():
    step_fn, tx, trainable, frozen = _me_setup()
    batch = _to_jnp(synthetic_me_batch(0, batch=4, img=32, n_kps=16))

    # --- 1-device reference run
    state = init_state(tx, trainable)
    state_ref, metrics_ref = jax.jit(step_fn)(state, frozen, batch)
    loss_ref = float(metrics_ref["loss"])

    # --- 4x2 DP x TP run
    mesh = _mesh()
    tr_tp = apply_tp_sharding(trainable, mesh)
    fz_tp = apply_tp_sharding(frozen, mesh)
    state_tp = init_state(tx, tr_tp)
    batch_tp = shard_batch(mesh, batch)
    with mesh:
        state_tp2, metrics_tp = jax.jit(step_fn)(state_tp, fz_tp, batch_tp)
    loss_tp = float(metrics_tp["loss"])

    assert abs(loss_tp - loss_ref) < 1e-5 * max(1.0, abs(loss_ref)), (
        loss_ref, loss_tp)
    ref_leaves = jax.tree_util.tree_leaves(jax.device_get(state_ref.trainable))
    tp_leaves = jax.tree_util.tree_leaves(jax.device_get(state_tp2.trainable))
    for a, b in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_mast3r_teacher_tp_matches_single_device():
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.teachers.mast3r import Mast3rTeacher

    teacher = Mast3rTeacher(
        Mast3rConfig(
            croco=CrocoConfig(
                patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
                dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
            ),
            local_feat_dim=6, dpt_feature_dim=16, dpt_last_dim=8,
        )
    )
    H, W = 32, 64
    params = teacher.init_params(jax.random.key(2), hw=(H, W))
    rng = np.random.RandomState(0)
    r1 = jnp.asarray(rng.rand(4, H, W, 3) * 2 - 1, jnp.float32)
    r2 = jnp.asarray(rng.rand(4, H, W, 3) * 2 - 1, jnp.float32)

    ref = jax.device_get(
        jax.jit(teacher.extract_features)(params, r1, r2, 0.8))

    mesh = _mesh()
    p_tp = apply_tp_sharding(params, mesh)
    assert _model_sharded_leaves(p_tp), "no teacher params landed TP-sharded"
    with mesh:
        got = jax.device_get(
            jax.jit(teacher.extract_features)(
                p_tp, *shard_batch(mesh, (r1, r2)), 0.8))
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=5e-4, atol=1e-5,
            err_msg=k)


@pytest.mark.slow
def test_vggt_teacher_tp_matches_single_device():
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher

    cfg = VggtConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        num_register_tokens=4, dino_depth=2, dino_num_heads=2,
        camera_trunk_depth=1, camera_iterations=2, dpt_features=8,
        dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
        track_features=8, track_iters=2, track_stride=2, corr_levels=2,
        corr_radius=1, track_hidden_size=16, track_depth=2,
        num_virtual_tracks=4,
    )
    teacher = VggtTeacher(cfg)
    params = teacher.init_params(jax.random.key(1), hw=(28, 28))
    rgb = jnp.asarray(
        np.random.RandomState(3).rand(4, 2, 28, 28, 3), jnp.float32)

    ref = jax.device_get(jax.jit(teacher.extract_features)(params, rgb, 0.9))

    mesh = _mesh()
    p_tp = apply_tp_sharding(params, mesh)
    assert _model_sharded_leaves(p_tp), "no VGGT params landed TP-sharded"
    with mesh:
        got = jax.device_get(
            jax.jit(teacher.extract_features)(
                p_tp, shard_batch(mesh, rgb), 0.9))
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(ref[k]), np.asarray(got[k]), rtol=5e-4, atol=5e-5,
            err_msg=k)


@pytest.mark.slow
def test_vggt_step_tp_live_keypoints_matches_single_device():
    """Full VGGT distillation TRAIN step with LIVE keypoints (biased camera
    + track-flow heads, gd3d.teachers.vggt.bias_params_for_live_keypoints)
    over the 4x2 DP x TP mesh vs the plain 1-device run: num_kps must be
    nonzero and every kp-dependent loss (ap, depth, intra_depth, kl) must
    match — round 2 only ever exercised the zero-kp guard path on-mesh
    (VERDICT r2 item 4; reference live-kp step finetune_timm_vggt.py:413-447).
    """
    from gd3d.core.config import LossWeights
    from gd3d.distill.vggt_step import build_vggt_train_step
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher, bias_params_for_live_keypoints

    vcfg = VggtConfig(
        img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
        num_register_tokens=4, dino_depth=2, dino_num_heads=2,
        camera_trunk_depth=1, camera_iterations=2, dpt_features=8,
        dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
        track_features=8, track_iters=2, track_stride=2, corr_levels=2,
        corr_radius=1, track_hidden_size=16, track_depth=2,
        num_virtual_tracks=4,
    )
    teacher = VggtTeacher(vcfg)
    tparams = bias_params_for_live_keypoints(
        teacher.init_params(jax.random.key(1), hw=(28, 28)), vcfg)

    cfg = DistillConfig(
        teacher="vggt", dataset="scannetpp",
        loss_weights=LossWeights(ap=1.0, depth=1.0, intra_depth=1.0, kl=1.0),
        student=StudentConfig(
            embed_dim=64, depth=2, num_heads=2, patch_size=16,
            pretrain_img_size=32, lora_start_block=1, use_adapters=True,
            adapter_bottleneck=8, target_res=64, depth_head_hidden=16,
        ),
    )
    student = Student(cfg.student)
    params = student.init(jax.random.key(5), img_size=32)
    trainable, frozen = split_params(params)
    tx = make_optimizer(cfg.train)
    step_fn = build_vggt_train_step(student, teacher, cfg, tx)

    rng = np.random.RandomState(0)
    batch = {
        "rgb_1": jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(4, 64, 64, 3), jnp.float32),
        "rgb_vggt": jnp.asarray(rng.rand(4, 2, 28, 28, 3), jnp.float32),
    }
    key = jax.random.key(7)

    state = init_state(tx, trainable)
    state_ref, m_ref = jax.jit(step_fn)(state, frozen, tparams, batch, 1.0, key)
    assert float(m_ref["num_kps"]) > 0, "biased heads still drove 0 kps"

    mesh = _mesh()
    tr_tp = apply_tp_sharding(trainable, mesh)
    fz_tp = apply_tp_sharding(frozen, mesh)
    tp_tparams = apply_tp_sharding(tparams, mesh)
    state_tp = init_state(tx, tr_tp)
    batch_tp = shard_batch(mesh, batch)
    with mesh:
        state_tp2, m_tp = jax.jit(step_fn)(
            state_tp, fz_tp, tp_tparams, batch_tp, 1.0, key)

    assert float(m_tp["num_kps"]) == float(m_ref["num_kps"]), (
        float(m_ref["num_kps"]), float(m_tp["num_kps"]))
    for k in ("loss", "ap_loss", "depth_loss", "intra_depth_loss", "kl_loss"):
        a, b = float(m_ref[k]), float(m_tp[k])
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (k, a, b)
    ref_leaves = jax.tree_util.tree_leaves(jax.device_get(state_ref.trainable))
    tp_leaves = jax.tree_util.tree_leaves(jax.device_get(state_tp2.trainable))
    for a, b in zip(ref_leaves, tp_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6)
