"""FSDP/ZeRO-3-style frozen-teacher parameter sharding
(gd3d/parallel/fsdp.py) on the virtual 8-CPU mesh.

The reference replicates every model per DDP rank (src/main.py:147-161);
gd3d adds weight sharding over the data axis for the 1B-param VGGT teacher.
Claims: (a) the spec picker shards the largest eligible dim and composes
with the TP rules, (b) a full VGGT distillation step with live keypoints
and an FSDP(+TP)-sharded teacher matches the plain 1-device run, (c) the
diagnostic accounts bytes correctly.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gd3d.core.config import DistillConfig, LossWeights, StudentConfig
from gd3d.core.mesh import DATA_AXIS, make_mesh, shard_batch
from gd3d.distill import make_optimizer
from gd3d.distill.train_state import init_state
from gd3d.models.student import Student, split_params
from gd3d.parallel.fsdp import (
    apply_fsdp_sharding,
    fsdp_spec,
    sharded_fraction,
)


def _mesh():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.devices.shape == (4, 2)
    return mesh


def test_fsdp_spec_largest_dim_and_tp_composition():
    x = np.zeros((8, 64, 32), np.float32)
    assert fsdp_spec(x, 4, min_size=0) == P(None, DATA_AXIS, None)
    # TP already owns dim 1 -> FSDP takes the next largest eligible dim
    assert fsdp_spec(x, 4, tp_spec=P(None, "model", None), min_size=0) == \
        P(None, "model", DATA_AXIS)
    # nothing divisible -> replicated (or tp-only)
    y = np.zeros((3, 5), np.float32)
    assert fsdp_spec(y, 4, min_size=0) == P()
    assert fsdp_spec(y, 4, tp_spec=P("model", None), min_size=0) == \
        P("model", None)
    # below min_size stays replicated
    assert fsdp_spec(np.zeros((8, 8), np.float32), 4) == P()


def test_fsdp_sharding_lands_and_preserves_values():
    mesh = _mesh()
    params = {
        "big": np.arange(4 * 64 * 16, dtype=np.float32).reshape(4, 64, 16),
        "tiny": np.arange(8, dtype=np.float32),
    }
    sharded = apply_fsdp_sharding(params, mesh, min_size=0)
    spec_big = sharded["big"].sharding.spec
    assert DATA_AXIS in [str(s) for s in spec_big if s is not None]
    shard = sharded["big"].addressable_shards[0].data
    assert shard.size == sharded["big"].size // 4
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(sharded["big"])), params["big"])
    sh, tot = sharded_fraction(sharded, mesh)
    assert tot == params["big"].nbytes + params["tiny"].nbytes
    # min_size=0 shards the (8,)-elem tiny leaf too (divisible by 4)
    assert sh == tot


def test_vggt_step_fsdp_teacher_matches_single_device():
    """Full VGGT distillation step, live keypoints, teacher params sharded
    FSDP(+TP) over the 4x2 mesh vs the plain 1-device run."""
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
    state_ref, m_ref = jax.jit(step_fn)(
        state, frozen, tparams, batch, 1.0, key)
    assert float(m_ref["num_kps"]) > 0

    mesh = _mesh()
    # min_size=0 so the tiny test teacher actually shards; production
    # leaves (1B VGGT) clear the default threshold on their own
    tp_fsdp = apply_fsdp_sharding(tparams, mesh, with_tp=True, min_size=0)
    sh, tot = sharded_fraction(tp_fsdp, mesh)
    assert sh > 0.5 * tot, (sh, tot)
    state_m = init_state(tx, trainable)
    batch_m = shard_batch(mesh, batch)
    with mesh:
        state_m2, m_fsdp = jax.jit(step_fn)(
            state_m, frozen, tp_fsdp, batch_m, 1.0, key)

    assert float(m_fsdp["num_kps"]) == float(m_ref["num_kps"])
    for k in ("loss", "ap_loss", "depth_loss", "intra_depth_loss",
              "kl_loss"):
        a, b = float(m_ref[k]), float(m_fsdp[k])
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (k, a, b)
    ref_leaves = jax.tree_util.tree_leaves(
        jax.device_get(state_ref.trainable))
    m_leaves = jax.tree_util.tree_leaves(
        jax.device_get(state_m2.trainable))
    for a, b in zip(ref_leaves, m_leaves):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6)


def test_mast3r_teacher_fsdp_forward_matches():
    """Frozen MASt3R teacher extract_features with FSDP-sharded weights
    equals the replicated forward."""
    from gd3d.models.croco import CrocoConfig
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.teachers.mast3r import Mast3rTeacher

    teacher = Mast3rTeacher(
        Mast3rConfig(
            croco=CrocoConfig(
                patch_size=16, enc_embed_dim=32, enc_depth=2,
                enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                dec_num_heads=2),
            local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16))
    params = teacher.init_params(jax.random.key(0), hw=(32, 32))
    rng = np.random.RandomState(2)
    i1 = jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32)
    i2 = jnp.asarray(rng.rand(4, 32, 32, 3) * 2 - 1, jnp.float32)

    ref = teacher.extract_features(params, i1, i2, 1.0)

    mesh = _mesh()
    p_fsdp = apply_fsdp_sharding(params, mesh, with_tp=True, min_size=0)
    with mesh:
        got = jax.jit(
            lambda p, a, b: teacher.extract_features(p, a, b, 1.0)
        )(p_fsdp, *shard_batch(mesh, (i1, i2)))
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-4, atol=2e-5)
