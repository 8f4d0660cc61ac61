"""VGGT stack: tiny end-to-end smoke + geometry/pose parity vs torch."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
import torch

from gd3d.core.config import DistillConfig, KeypointConfig, LossWeights, StudentConfig
from gd3d.distill import make_optimizer
from gd3d.distill.train_state import init_state
from gd3d.distill.vggt_step import build_vggt_train_step
from gd3d.models.student import Student, split_params
from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.heads import (
    pose_encoding_to_extri_intri,
    quat_to_mat,
    unproject_depth_to_world,
)
from gd3d.models.vggt.model import Vggt
from gd3d.teachers.vggt import VggtTeacher

TINY = VggtConfig(
    img_size=28,
    patch_size=14,
    embed_dim=32,
    depth=2,
    num_heads=2,
    num_register_tokens=4,
    dino_depth=2,
    dino_num_heads=2,
    camera_trunk_depth=1,
    camera_iterations=2,
    dpt_features=8,
    dpt_out_channels=(8, 8, 8, 8),
    dpt_hooks=(0, 0, 1, 1),
    track_features=8,
    track_iters=2,
    track_stride=2,
    corr_levels=2,
    corr_radius=1,
    track_hidden_size=16,
    track_depth=2,
    num_virtual_tracks=4,
)


def test_quat_to_mat_matches_torch():
    rng = np.random.RandomState(0)
    q = rng.randn(5, 4).astype(np.float32)
    got = np.asarray(quat_to_mat(jnp.asarray(q)))
    i, j, k, r = torch.from_numpy(q).unbind(-1)
    two_s = 2.0 / (torch.from_numpy(q) ** 2).sum(-1)
    want = torch.stack(
        (
            1 - two_s * (j * j + k * k), two_s * (i * j - k * r),
            two_s * (i * k + j * r), two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k), two_s * (j * k - i * r),
            two_s * (i * k - j * r), two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ),
        -1,
    ).reshape(5, 3, 3).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pose_encoding_roundtrip_shapes():
    enc = jnp.asarray(
        np.concatenate(
            [
                np.random.RandomState(1).randn(1, 2, 3),
                np.tile([[[0, 0, 0, 1.0]]], (1, 2, 1)),
                np.full((1, 2, 2), 0.8),
            ],
            axis=-1,
        ),
        jnp.float32,
    )
    extr, intr = pose_encoding_to_extri_intri(enc, (28, 42))
    assert extr.shape == (1, 2, 3, 4)
    assert intr.shape == (1, 2, 3, 3)
    # identity quaternion -> identity rotation
    np.testing.assert_allclose(np.asarray(extr[0, 0, :3, :3]), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(float(intr[0, 0, 0, 2]), 21.0)


def test_unproject_identity_camera():
    depth = jnp.full((4, 6), 2.0)
    K = jnp.asarray([[10.0, 0, 3], [0, 10.0, 2], [0, 0, 1]])
    E = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    world = np.asarray(unproject_depth_to_world(depth, E, K))
    assert world.shape == (4, 6, 3)
    np.testing.assert_allclose(world[2, 3], [0.0, 0.0, 2.0], atol=1e-5)
    np.testing.assert_allclose(world[2, 4], [0.2, 0.0, 2.0], atol=1e-5)


@pytest.mark.slow
def test_vggt_three_frame_forward():
    """S > 2 runs: the cross-frame attention export is a pair construct
    (attention.py:51-85 splits tokens at N//2), so it must be gated off —
    not crash — for longer sequences."""
    model = Vggt(TINY)
    imgs = jnp.asarray(
        np.random.RandomState(4).rand(1, 3, 28, 28, 3), jnp.float32)
    params = model.init(jax.random.key(0), imgs)["params"]
    out = model.apply({"params": params}, imgs)
    assert out["pose_enc"].shape == (1, 3, 9)
    assert out["depth"].shape == (1, 3, 28, 28, 1)
    assert np.all(np.asarray(out["attn"]) == 0)  # export only at S == 2


def test_vggt_tiny_forward():
    model = Vggt(TINY)
    imgs = jnp.asarray(
        np.random.RandomState(2).rand(1, 2, 28, 28, 3), jnp.float32
    )
    qp = jnp.asarray(np.random.RandomState(3).rand(1, 5, 2) * 20, jnp.float32)
    params = model.init(jax.random.key(0), imgs, query_points=qp, run_track=True)[
        "params"
    ]
    out = model.apply(
        {"params": params}, imgs, temperature=0.8, query_points=qp, run_track=True
    )
    Pp = (28 // 14) ** 2
    assert out["pose_enc"].shape == (1, 2, 9)
    assert out["depth"].shape == (1, 2, 28, 28, 1)
    assert out["world_points"].shape == (1, 2, 28, 28, 3)
    assert out["attn"].shape == (2, Pp, Pp)
    assert out["track"].shape == (1, 2, 5, 2)
    assert float(out["depth"].min()) > 0  # exp activation
    assert float(out["depth_conf"].min()) >= 1.0  # expp1
    # attn rows are softmaxed
    np.testing.assert_allclose(
        np.asarray(out["attn"].sum(-1)), 1.0, rtol=1e-4
    )


@pytest.mark.slow
def test_vggt_distill_step():
    cfg = DistillConfig(
        teacher="vggt",
        dataset="scannetpp",
        student=StudentConfig(
            embed_dim=32, depth=8, num_heads=2, patch_size=16,
            pretrain_img_size=32, lora_start_block=4, use_adapters=True,
            adapter_bottleneck=8, target_res=64, depth_head_hidden=16,
        ),
        loss_weights=LossWeights(1.0, 1.0, 1.0, 1.0),
        keypoints=KeypointConfig(nms_num=32, nms_min_distance=2),
    )
    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=32)
    trainable, frozen = split_params(params)
    teacher = VggtTeacher(TINY)
    tparams = teacher.init_params(jax.random.key(1), hw=(28, 28))
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)

    step = jax.jit(build_vggt_train_step(student, teacher, cfg, tx))
    batch = {
        "rgb_1": jnp.asarray(np.random.RandomState(4).rand(1, 64, 64, 3), jnp.float32),
        "rgb_2": jnp.asarray(np.random.RandomState(5).rand(1, 64, 64, 3), jnp.float32),
        "rgb_vggt": jnp.asarray(
            np.random.RandomState(6).rand(1, 2, 28, 28, 3), jnp.float32
        ),
    }
    state2, m = step(state, frozen, tparams, batch, 1.0, jax.random.key(2))
    for k in ("loss", "ap_loss", "depth_loss", "intra_depth_loss", "kl_loss"):
        assert np.isfinite(float(m[k])), k
    assert int(state2.step) == 1

    # K-steps-per-dispatch scan trainer: 2 scanned steps over the same batch
    # advance the state twice and return stacked finite metrics
    from gd3d.distill.vggt_step import build_vggt_train_multistep

    multi = jax.jit(build_vggt_train_multistep(student, teacher, cfg, tx))
    stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
    state3, ms = multi(state, frozen, tparams, stacked, 1.0, jax.random.key(2))
    assert int(state3.step) == 2
    assert ms["loss"].shape == (2,)
    assert np.all(np.isfinite(np.asarray(ms["loss"])))


@pytest.mark.slow
def test_track_from_tokens_matches_full_forward():
    """The no-aggregator-rerun track path (track_from_tokens, the round-2
    perf fix matching finetune_timm_vggt.py:438's saved-token tracking) must
    produce the same correspondences as the full forward."""
    from gd3d.teachers.vggt import VggtTeacher

    teacher = VggtTeacher(TINY)
    params = teacher.init_params(jax.random.key(1), hw=(28, 28))
    rgb = jnp.asarray(np.random.RandomState(5).rand(1, 2, 28, 28, 3),
                      jnp.float32)
    kp_1 = jnp.floor(
        jnp.asarray(np.random.RandomState(6).rand(1, 7, 2) * 20, jnp.float32))

    want = teacher.track_correspondences(params, rgb, kp_1, 0.9)
    feats, ttok = teacher.extract_features(
        params, rgb, 0.9, return_track_tokens=True)
    got = teacher.track_from_tokens(params, ttok, (28, 28), kp_1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # and sample_keypoints on the fast path equals the slow path
    key = jax.random.key(3)
    slow = teacher.sample_keypoints(params, feats, rgb, key)
    fast = teacher.sample_keypoints(params, feats, rgb, key,
                                    track_tokens=ttok)
    for a, b in zip(slow, fast):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
