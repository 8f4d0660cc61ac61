"""End-to-end MASt3R distillation step on tiny models (CPU)."""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gd3d.core.config import DistillConfig, KeypointConfig, StudentConfig
from gd3d.distill.mast3r_step import (
    build_mast3r_train_step,
    temperature_schedule,
)
from gd3d.distill.train_state import init_state
from gd3d.distill import make_optimizer
from gd3d.models.croco import CrocoConfig
from gd3d.models.mast3r import Mast3rConfig
from gd3d.models.student import Student, split_params
from gd3d.teachers.mast3r import Mast3rTeacher

CFG = DistillConfig(
    teacher="mast3r",
    dataset="scannetpp",
    student=StudentConfig(
        embed_dim=32, depth=8, num_heads=2, patch_size=16,
        pretrain_img_size=32, lora_start_block=4, use_adapters=True,
        adapter_bottleneck=8, target_res=64, downsample_factor=8,
        depth_head_hidden=16,
    ),
    keypoints=KeypointConfig(nn_subsample=16),
)

TINY_TEACHER = Mast3rConfig(
    croco=CrocoConfig(
        patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
    ),
    local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16,
)


def _batch(rng, B=1, H=64, W=96, has_depth=False):
    b = {
        "rgb_1": rng.rand(B, 128, 128, 3).astype(np.float32),
        "rgb_2": rng.rand(B, 128, 128, 3).astype(np.float32),
        "rgb_mast3r_1": (rng.rand(B, H, W, 3) * 2 - 1).astype(np.float32),
        "rgb_mast3r_2": (rng.rand(B, H, W, 3) * 2 - 1).astype(np.float32),
        "intrinsic": np.tile(
            np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32),
            (B, 1, 1),
        ),
    }
    if has_depth:
        b["depth_1"] = rng.rand(B, 128, 128).astype(np.float32)
        b["depth_2"] = rng.rand(B, 128, 128).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in b.items()}


def _setup():
    student = Student(CFG.student)
    params = student.init(jax.random.key(0), img_size=32)
    trainable, frozen = split_params(params)
    teacher = Mast3rTeacher(TINY_TEACHER)
    tparams = teacher.init_params(jax.random.key(1), hw=(64, 96))
    tx = make_optimizer(CFG.train)
    state = init_state(tx, trainable)
    return student, teacher, state, frozen, tparams, tx


@pytest.mark.slow
def test_mast3r_step_scannetpp_path():
    student, teacher, state, frozen, tparams, tx = _setup()
    step = jax.jit(
        build_mast3r_train_step(student, teacher, CFG, tx, has_depth=False)
    )
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    state2, m = step(state, frozen, tparams, batch, 1.0)
    for k in ("loss", "ap_loss", "depth_loss", "intra_depth_loss", "kl_loss"):
        assert np.isfinite(float(m[k])), k
    assert float(m["num_kps"]) > 0
    assert int(state2.step) == 1
    # temperature is a runtime scalar: same compiled fn, different temp
    state3, m2 = step(state2, frozen, tparams, batch, 0.75)
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_mast3r_step_objaverse_depth_path():
    student, teacher, state, frozen, tparams, tx = _setup()
    step = jax.jit(
        build_mast3r_train_step(student, teacher, CFG, tx, has_depth=True)
    )
    batch = _batch(np.random.RandomState(1), has_depth=True)
    state2, m = step(state, frozen, tparams, batch, 1.0)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_gradients_flow_only_to_trainable():
    student, teacher, state, frozen, tparams, tx = _setup()
    step = jax.jit(
        build_mast3r_train_step(student, teacher, CFG, tx, has_depth=False)
    )
    batch = _batch(np.random.RandomState(2))
    before = jax.tree_util.tree_leaves(state.trainable)
    state2, _ = step(state, frozen, tparams, batch, 1.0)
    after = jax.tree_util.tree_leaves(state2.trainable)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )


def test_temperature_schedule():
    cfg = CFG
    assert temperature_schedule(cfg, 0) == 1.0
    assert abs(temperature_schedule(cfg, cfg.train.max_epochs) - 0.5) < 1e-6
    mid = temperature_schedule(cfg, cfg.train.max_epochs // 2)
    assert 0.5 < mid < 1.0


@pytest.mark.slow
def test_multistep_matches_sequential_steps():
    """K steps per dispatch == K sequential dispatches (bit-for-bit state)."""
    from gd3d.distill.mast3r_step import build_mast3r_train_multistep

    student, teacher, state, frozen, tparams, tx = _setup()
    step = jax.jit(
        build_mast3r_train_step(student, teacher, CFG, tx, has_depth=False)
    )
    multi = jax.jit(
        build_mast3r_train_multistep(student, teacher, CFG, tx,
                                     has_depth=False)
    )
    K = 2
    batches = [_batch(np.random.RandomState(10 + i)) for i in range(K)]
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}

    s_seq = state
    seq_losses = []
    for b in batches:
        s_seq, m = step(s_seq, frozen, tparams, b, 1.0)
        seq_losses.append(float(m["loss"]))

    s_multi, m_multi = multi(state, frozen, tparams, stacked, 1.0)
    assert m_multi["loss"].shape == (K,)
    np.testing.assert_allclose(
        np.asarray(m_multi["loss"]), np.asarray(seq_losses), rtol=2e-5
    )
    assert int(s_multi.step) == K
    for a, b in zip(
        jax.tree_util.tree_leaves(s_seq.trainable),
        jax.tree_util.tree_leaves(s_multi.trainable),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6
        )
