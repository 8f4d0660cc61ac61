import jax.numpy as jnp
import numpy as np

from gd3d.ops import (
    point_cloud_to_depth,
    extract_kp_depth,
    compute_projection,
    convert_camera_to_world,
    coview_masks,
    query_pose_error,
)


def test_point_cloud_to_depth_averages_collisions():
    K = jnp.asarray([[100.0, 0, 2], [0, 100.0, 2], [0, 0, 1]])
    # two points projecting to the same pixel (0,0 dir -> cx,cy) with z 2 and 4
    pts = jnp.asarray([
        [0.0, 0.0, 2.0],
        [0.0, 0.0, 4.0],
        [0.02, 0.0, 2.0],   # u = 0.02/2*100+2 = 3
        [0.0, 0.0, -1.0],   # behind camera: dropped
        [10.0, 10.0, 1.0],  # out of bounds: dropped
    ])
    depth = np.asarray(point_cloud_to_depth(pts, K, w=5, h=5))
    assert depth.shape == (1, 1, 5, 5)
    np.testing.assert_allclose(depth[0, 0, 2, 2], 3.0)  # mean(2,4)
    np.testing.assert_allclose(depth[0, 0, 2, 3], 2.0)
    assert depth[0, 0].sum() == 5.0  # everything else 0


def test_extract_kp_depth_window_mean():
    d = np.arange(25, dtype=np.float32).reshape(5, 5)
    kp = jnp.asarray([[[2.0, 2.0], [0.0, 0.0]]])  # (x, y)
    got = np.asarray(extract_kp_depth(jnp.asarray(d), kp, window_size=3))
    # center 3x3 window mean around (2,2) = mean of d[1:4,1:4] = 12
    np.testing.assert_allclose(got[0, 0], 12.0)
    # corner (0,0) replicate-padded window: rows [0,0,1], cols [0,0,1]
    win = np.array([
        d[0, 0], d[0, 0], d[0, 1],
        d[0, 0], d[0, 0], d[0, 1],
        d[1, 0], d[1, 0], d[1, 1],
    ])
    np.testing.assert_allclose(got[0, 1], win.mean())


def test_projection_roundtrip():
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    E = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)  # identity cam
    P = jnp.asarray(K @ E)
    pts = jnp.asarray([[0.1, -0.2, 2.0], [0.0, 0.0, 1.0]])
    proj = np.asarray(compute_projection(P, pts))
    np.testing.assert_allclose(proj[1], [32.0, 24.0], atol=1e-4)
    np.testing.assert_allclose(proj[0], [32 + 0.05 * 50, 24 - 0.1 * 50], rtol=1e-3)


def test_camera_to_world_matches_reference_formula():
    """Parity with utils/functions.py:454-459: out = (x - t) @ R^T."""
    rng = np.random.RandomState(0)
    q, _ = np.linalg.qr(rng.randn(3, 3))
    t = rng.randn(3)
    E = np.concatenate([q, t[:, None]], axis=1).astype(np.float32)
    cam = rng.randn(10, 3).astype(np.float32)
    want = (cam - t[None, :]) @ q.T
    back = np.asarray(convert_camera_to_world(jnp.asarray(cam), jnp.asarray(E)))
    np.testing.assert_allclose(back, want, atol=1e-3)


def test_coview_masks_shapes():
    H, W = 8, 10
    pm1 = jnp.ones((H, W, 3)) * jnp.asarray([0.0, 0.0, 2.0])
    pm2 = pm1
    K = jnp.asarray([[10.0, 0, 5], [0, 10.0, 4], [0, 0, 1]])
    E = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    m1, m2 = coview_masks(pm1, pm2, K, E, K, E, (H, W))
    assert m1.shape == (H, W) and m2.shape == (H, W)
    assert bool(m1.all()) and bool(m2.all())


def test_query_pose_error():
    gt = np.eye(4)
    pred = np.eye(4)
    pred[:3, 3] = [0.01, 0, 0]  # 1 cm off
    ang, trans = query_pose_error(pred, gt)
    np.testing.assert_allclose(ang, 0.0, atol=1e-4)
    np.testing.assert_allclose(trans, 1.0, atol=1e-6)
