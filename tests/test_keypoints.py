"""Reciprocal-NN keypoint pipeline vs a numpy transcription of
mast3r/fast_nn.py:109-188 (dot similarity, grid init, 10 iters)."""
import jax.numpy as jnp
import numpy as np

from gd3d.distill.keypoints import (
    blockwise_argmax_dot,
    filter_and_match_keypoints,
    reciprocal_nn_grid,
)


def numpy_fast_reciprocal_nns(pts1, pts2, H, W, S=4, max_iter=10):
    p1 = pts1.reshape(-1, pts1.shape[-1])
    p2 = pts2.reshape(-1, pts2.shape[-1])
    y1, x1 = np.mgrid[S // 2 : H : S, S // 2 : W : S].reshape(2, -1)
    xy1 = np.int32(np.unique(x1 + W * y1))
    xy2 = np.full_like(xy1, -1)
    old_xy1 = xy1.copy()
    old_xy2 = xy2.copy()
    notyet = np.ones(len(xy1), dtype=bool)
    niter = 0
    while notyet.any():
        xy2[notyet] = (p1[xy1[notyet]] @ p2.T).argmax(-1)
        notyet &= old_xy2 != xy2
        xy1[notyet] = (p2[xy2[notyet]] @ p1.T).argmax(-1)
        notyet &= old_xy1 != xy1
        niter += 1
        if niter >= max_iter:
            break
        old_xy2[:] = xy2
        old_xy1[:] = xy1
    converged = ~notyet
    pairs = sorted(set(zip(xy2[converged].tolist(), xy1[converged].tolist())))
    return pairs  # list of (idx2, idx1), sorted on idx2-major


def test_blockwise_argmax_matches_dense():
    rng = np.random.RandomState(0)
    Q = rng.randn(17, 8).astype(np.float32)
    DB = rng.randn(100, 8).astype(np.float32)
    got = np.asarray(blockwise_argmax_dot(jnp.asarray(Q), jnp.asarray(DB), block=32))
    want = (Q @ DB.T).argmax(-1)
    np.testing.assert_array_equal(got, want)


def test_reciprocal_nn_matches_numpy_reference():
    rng = np.random.RandomState(1)
    H, W, D = 12, 16, 8
    d1 = rng.randn(H, W, D).astype(np.float32)
    d2 = rng.randn(H, W, D).astype(np.float32)
    xy1, xy2, conv = reciprocal_nn_grid(
        jnp.asarray(d1), jnp.asarray(d2), H, W, subsample=4
    )
    xy1, xy2, conv = np.asarray(xy1), np.asarray(xy2), np.asarray(conv)
    got = sorted(set(zip(xy2[conv].tolist(), xy1[conv].tolist())))
    want = numpy_fast_reciprocal_nns(d1, d2, H, W, S=4)
    assert got == want


def test_reciprocal_nn_identity_descriptors():
    """Identical descriptor fields must converge to identity matches."""
    rng = np.random.RandomState(2)
    H, W, D = 8, 8, 16
    d = rng.randn(H, W, D).astype(np.float32) * 3
    xy1, xy2, conv = reciprocal_nn_grid(
        jnp.asarray(d), jnp.asarray(d), H, W, subsample=4
    )
    xy1, xy2, conv = np.asarray(xy1), np.asarray(xy2), np.asarray(conv)
    assert conv.any()
    np.testing.assert_array_equal(xy1[conv], xy2[conv])


def test_filter_and_match_border_and_conf():
    rng = np.random.RandomState(3)
    H, W, D = 16, 16, 8
    d = rng.randn(H, W, D).astype(np.float32) * 3
    feats = {
        "desc_1": jnp.asarray(d),
        "desc_2": jnp.asarray(d),
        "conf_1": jnp.asarray(np.full((H, W), 5.0, np.float32)),
        "conf_2": jnp.asarray(np.full((H, W), 5.0, np.float32)),
    }
    kp1, kp2, valid = filter_and_match_keypoints(feats, H, W, subsample=4)
    kp1, kp2, valid = np.asarray(kp1), np.asarray(kp2), np.asarray(valid)
    assert valid.any()
    # all valid kps respect the 3px border
    assert (kp1[valid] >= 3).all() and (kp1[valid] < W - 3).all()
    np.testing.assert_array_equal(kp1[valid], kp2[valid])
