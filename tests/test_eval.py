"""Eval suite: TAP-Vid metric parity, tracker engine behavior, PCK harness
on synthetic fixtures, OnePose matching/PnP."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gd3d.core.config import StudentConfig
from gd3d.eval.onepose import grid_keypoints, mutual_nn_match, solve_pose
from gd3d.eval.pck import match_pair, preprocess_kps_pad, resize_to_canvas
from gd3d.eval.tracker import (
    TrackerConfig,
    generate_trajectories,
    infer_tracks,
)
from gd3d.eval.tracking_metrics import (
    compute_tapvid_metrics,
    compute_tapvid_metrics_for_video,
)
from gd3d.models.student import Student
from PIL import Image

SMALL = StudentConfig(
    embed_dim=32, depth=2, num_heads=2, patch_size=16,
    pretrain_img_size=32, lora_start_block=99, use_adapters=False,
    target_res=64, depth_head_hidden=16,
)


def test_tapvid_metrics_perfect_prediction():
    B, N, T = 1, 6, 5
    rng = np.random.RandomState(0)
    tracks = rng.rand(B, N, T, 2) * 100
    occ = np.zeros((B, N, T), bool)
    q = np.stack(
        [np.zeros(N), tracks[0, :, 0, 1], tracks[0, :, 0, 0]], axis=1
    )[None]
    m = compute_tapvid_metrics(q, occ, tracks, occ, tracks, "strided")
    assert m["average_jaccard"][0] == pytest.approx(1.0)
    assert m["occlusion_accuracy"][0] == pytest.approx(1.0)
    assert m["average_pts_within_thresh"][0] == pytest.approx(1.0)


def test_tapvid_metrics_off_predictions():
    B, N, T = 1, 4, 6
    tracks = np.zeros((B, N, T, 2)) + 50
    pred = tracks.copy()
    pred[..., 0] += 3.0  # off by 3 px: inside 4/8/16, outside 1/2
    occ = np.zeros((B, N, T), bool)
    q = np.zeros((B, N, 3))
    m = compute_tapvid_metrics(q, occ, tracks, occ, pred, "strided")
    assert m["pts_within_1"][0] == pytest.approx(0.0)
    assert m["pts_within_4"][0] == pytest.approx(1.0)


def test_tapvid_for_video_dict_api():
    T, N = 4, 3
    video = {
        "video_idx": 0, "h": 100, "w": 200,
        "query_points": {0: [[10.0, 20.0]] * N},
        "target_points": {0: np.full((N, T, 2), 30.0)},
        "occluded": {0: np.zeros((N, T), bool)},
    }
    bench = {"videos": [video]}
    trajs = {0: np.full((N, T, 2), 30.0)}
    occs = {0: np.zeros((N, T), bool)}
    m = compute_tapvid_metrics_for_video(trajs, occs, bench, 0)
    assert m["average_jaccard"] == pytest.approx(1.0)


def test_tracker_identifies_matching_patch():
    """A distinctive feature at one location must be tracked to the location
    where the same feature appears in other frames."""
    # small argmax radius + interior peaks: the reference's full-map softmax
    # deliberately spreads mass over the circular mask, which biases
    # soft-argmax towards the mask centroid near image borders — test away
    # from borders to probe the matching behavior itself.
    cfg = TrackerConfig(patch_size=16, stride=8, argmax_radius=10,
                        video_h=96, video_w=128)
    gh = 1 + (96 - 16) // 8
    gw = 1 + (128 - 16) // 8
    T, C = 3, 16
    rng = np.random.RandomState(0)
    feats = rng.randn(T, gh, gw, C).astype(np.float32) * 0.01
    sig = rng.randn(C).astype(np.float32) * 5
    locs = [(4, 5), (6, 9), (5, 8)]  # (gy, gx) per frame, interior
    for t, (gy, gx) in enumerate(locs):
        feats[t, gy, gx] = sig

    # query at patch center of frame-0 location
    qx = 16 // 2 + locs[0][1] * 8
    qy = 16 // 2 + locs[0][0] * 8
    q = np.array([[qx, qy, 0]], np.float32)
    trajs = np.asarray(generate_trajectories(jnp.asarray(feats), jnp.asarray(q), cfg))
    for t, (gy, gx) in enumerate(locs):
        ex = 16 // 2 + gx * 8
        ey = 16 // 2 + gy * 8
        assert abs(trajs[0, t, 0] - ex) < 4.0, (t, trajs[0, t])
        assert abs(trajs[0, t, 1] - ey) < 4.0, (t, trajs[0, t])


def test_infer_tracks_full_pipeline():
    cfg = TrackerConfig(patch_size=16, stride=8, argmax_radius=20,
                        video_h=64, video_w=64)
    gh = gw = 1 + (64 - 16) // 8
    rng = np.random.RandomState(1)
    feats = rng.randn(4, gh, gw, 8).astype(np.float32)
    q = np.array([[24, 24, 0], [40, 40, 1]], np.float32)
    trajs, occ = infer_tracks(feats, q, cfg)
    assert trajs.shape == (2, 4, 2)
    assert occ.shape == (2, 4)
    assert occ.dtype == bool


def test_preprocess_kps_pad():
    kps = np.array([[10.0, 20.0, 1.0], [5.0, 5.0, 0.0]], np.float32)
    out = preprocess_kps_pad(kps, 200, 100, 64)
    # landscape: y offset (64 - 32) // 2 = 16
    np.testing.assert_allclose(out[0], [10 * 0.32, 20 * 0.32 + 16, 1.0])
    np.testing.assert_allclose(out[1], [0, 0, 0])  # invisible zeroed


def test_resize_to_canvas():
    img = Image.fromarray(np.full((50, 100, 3), 200, np.uint8))
    canvas = resize_to_canvas(img, 64)
    assert canvas.shape == (64, 64, 3)
    assert canvas[0, 0, 0] == 0  # padded top
    assert canvas[32, 32, 0] > 0


def test_match_pair_identical_images():
    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    rng = np.random.RandomState(2)
    img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    kps = np.array([[24.0, 24.0, 1.0], [40.0, 32.0, 1.0]], np.float32)
    pred = match_pair(student, params, img, img, kps, img_size=64)
    # same image: predictions should be close to the queries
    err = np.linalg.norm(pred - kps[:, :2], axis=-1)
    assert (err < 16).all(), pred


def test_match_fn_commuted_sim_matches_reference_order():
    """The matcher dots on the patch grid then upsamples the similarity
    (linear maps commute); this pins it against the reference's
    upsample-features-then-dot order (evaluate_timm.py:516-547)."""
    from gd3d.eval.pck import make_match_fn
    from gd3d.models.dpt import resize_bilinear_ac
    from gd3d.ops.interpolate import interpolate_features

    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    rng = np.random.RandomState(4)
    size, ps = 64, 16
    img1 = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    img2 = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    kps = (rng.rand(5, 2) * (size - 8) + 4).astype(np.float32)

    match = make_match_fn(student, img_size=size, max_kps=5, batch_pairs=2)
    pred = match(params, img1, img2, kps)

    # reference order: upsample dense features to size^2, edge-pad, dot
    d1 = student.dense_grid_features(
        params, jnp.asarray(img1[None], jnp.float32) / 255.0, refine=True)
    d2 = student.dense_grid_features(
        params, jnp.asarray(img2[None], jnp.float32) / 255.0, refine=True)
    ds = ((size - ps) // ps) * ps + 1
    d2_up = resize_bilinear_ac(d2, (ds, ds))
    pad_l = ps // 2
    d2_full = jnp.pad(
        d2_up, ((0, 0), (pad_l, size - ds - pad_l),
                (pad_l, size - ds - pad_l), (0, 0)), mode="edge")
    # the reference samples source-kp descriptors with interpolate_features'
    # DEFAULT patch_size=14/stride=14 alignment (evaluate_timm.py:542 passes
    # no patch/stride even though the grid is patch-16) — match_fn reproduces
    # that, so the commuted-order expectation must too
    kp_desc = interpolate_features(
        d1.transpose(0, 3, 1, 2), jnp.asarray(kps[None]),
        h=size, w=size, normalize=True, patch_size=14, stride=14)
    sim = jnp.einsum("cn,hwc->nhw", kp_desc[0], d2_full[0]).reshape(5, -1)
    nn = np.asarray(jnp.argmax(sim, axis=1))
    ref = np.stack([nn % size, nn // size], 1)
    np.testing.assert_array_equal(pred, ref)


def test_match_many_matches_single_pair_path():
    from gd3d.eval.pck import make_match_fn

    student = Student(SMALL)
    params = student.init(jax.random.key(0), img_size=32)
    rng = np.random.RandomState(5)
    pairs = [
        ((rng.rand(64, 64, 3) * 255).astype(np.uint8),
         (rng.rand(64, 64, 3) * 255).astype(np.uint8),
         (rng.rand(3 + i, 2) * 56 + 4).astype(np.float32))
        for i in range(5)  # 5 pairs -> one full chunk of 2 + padded tail
    ]
    match = make_match_fn(student, img_size=64, max_kps=8, batch_pairs=2)
    many = match.many(params, pairs)
    for (i1, i2, k), m in zip(pairs, many):
        np.testing.assert_array_equal(m, match(params, i1, i2, k))
        assert m.shape == (k.shape[0], 2)


def test_mutual_nn_and_pnp():
    rng = np.random.RandomState(3)
    desc_t = rng.randn(50, 16).astype(np.float32)
    desc_t /= np.linalg.norm(desc_t, axis=-1, keepdims=True)
    desc_q = desc_t[::2] + rng.randn(25, 16).astype(np.float32) * 0.01
    nn = mutual_nn_match(desc_q, desc_t, chunk_elems=64)
    good = nn >= 0
    assert good.sum() > 15
    assert (nn[good] == np.arange(0, 50, 2)[good]).mean() > 0.8

    # PnP on clean correspondences recovers identity-ish pose
    pts3d = rng.rand(40, 3) * 0.2 + np.array([0, 0, 1.0])
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    uv = (pts3d @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    pose = solve_pose(uv, pts3d, K)
    np.testing.assert_allclose(pose[:3, :3], np.eye(3), atol=1e-2)
    np.testing.assert_allclose(pose[:3, 3], 0, atol=1e-2)


def test_grid_keypoints():
    kp = grid_keypoints(8, 12, 4)
    assert kp.shape == (6, 2)
    assert kp[:, 0].max() == 8 and kp[:, 1].max() == 4


def test_mutual_nn_device_path_matches_numpy():
    """The on-device chunked argmax matcher (the TPU replacement for the
    reference's GPU matmul, ~1000x over 1-core numpy at real shapes) must
    produce the numpy path's matches exactly at fp32-safe scales."""
    from gd3d.eval.onepose import mutual_nn_match_device

    rng = np.random.RandomState(3)
    # well-separated descriptors so reduced-precision matmul cannot flip
    # an argmax
    q = rng.randn(257, 16).astype(np.float32)
    t = rng.randn(511, 16).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    want = mutual_nn_match(q, t, chunk_elems=4096)
    got = mutual_nn_match_device(q, t)
    np.testing.assert_array_equal(got, want)
