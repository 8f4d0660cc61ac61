import jax
import jax.numpy as jnp
import numpy as np

from gd3d.ops import (
    patch_mask_from_kps,
    masked_patch_cost,
    sample_keypoints_nms,
    post_process_depth,
)


def test_patch_mask_from_kps():
    H, W, ps = 32, 48, 16  # 2 x 3 patches
    kps = jnp.asarray([
        [0.0, 0.0],    # patch (0,0) -> idx 0
        [47.0, 31.0],  # patch (1,2) -> idx 5
        [100.0, 0.0],  # out of bounds
        [-1.0, 5.0],   # out of bounds
    ])
    mask = np.asarray(patch_mask_from_kps(kps, H, W, ps))
    want = np.zeros(6, bool)
    want[0] = True
    want[5] = True
    np.testing.assert_array_equal(mask, want)


def test_patch_mask_respects_valid():
    kps = jnp.asarray([[0.0, 0.0], [17.0, 0.0]])
    valid = jnp.asarray([True, False])
    mask = np.asarray(patch_mask_from_kps(kps, 32, 32, 16, valid=valid))
    np.testing.assert_array_equal(mask, [True, False, False, False])


def test_masked_patch_cost_row_normalize():
    rng = np.random.RandomState(0)
    cost = np.abs(rng.rand(1, 4, 4)).astype(np.float32)
    m1 = jnp.asarray([True, False, True, False])
    out = np.asarray(masked_patch_cost(jnp.asarray(cost), m1))
    # masked rows are zero; unmasked rows sum to 1
    np.testing.assert_allclose(out[0, 1], 0.0)
    np.testing.assert_allclose(out[0, 3], 0.0)
    np.testing.assert_allclose(out[0, 0].sum(), 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 2].sum(), 1.0, rtol=1e-5)
    # row masking only: columns NOT masked (utils/functions.py:406-409)
    assert out[0, 0, 1] > 0


def test_masked_patch_cost_softmax_uniform_on_masked_rows():
    cost = jnp.asarray(np.random.RandomState(1).rand(1, 4, 4).astype(np.float32))
    m1 = jnp.asarray([True, False, True, True])
    out = np.asarray(masked_patch_cost(cost, m1, use_softmax=True))
    np.testing.assert_allclose(out[0, 1], 0.25 * np.ones(4), rtol=1e-5)
    np.testing.assert_allclose(out.sum(-1), np.ones((1, 4)), rtol=1e-5)


def test_sample_keypoints_nms_isolated_peaks():
    H, W = 32, 32
    conf = np.zeros((H, W), np.float32)
    peaks = [(4, 4), (4, 20), (20, 4), (20, 20)]
    for y, x in peaks:
        conf[y, x] = 1.0
    mask = jnp.asarray(conf > 0)
    kps, valid = sample_keypoints_nms(
        mask, jnp.asarray(conf), num=8, min_distance=5, rng=jax.random.key(0)
    )
    kps, valid = np.asarray(kps), np.asarray(valid)
    assert valid.sum() == 4
    got = {tuple(k) for k in kps[valid]}
    assert got == set(peaks)


def test_sample_keypoints_nms_caps_at_num():
    H, W = 16, 16
    conf = np.random.RandomState(0).rand(H, W).astype(np.float32)
    mask = jnp.ones((H, W), bool)
    kps, valid = sample_keypoints_nms(
        mask, jnp.asarray(conf), num=3, min_distance=1, rng=jax.random.key(1)
    )
    assert np.asarray(valid).sum() <= 3


def test_post_process_depth_constant_map_fixed_point():
    d = jnp.full((24, 24), 2.0)
    out = np.asarray(post_process_depth(d, kernel_size=3))
    assert out.shape == (24, 24)
    np.testing.assert_allclose(out, 2.0, rtol=1e-3)


def test_post_process_depth_fills_holes():
    d = np.full((24, 24), 2.0, np.float32)
    d[10, 10] = 0.0  # single hole
    out = np.asarray(post_process_depth(jnp.asarray(d), kernel_size=3))
    assert abs(out[10, 10] - 2.0) < 0.2
    assert np.isfinite(out).all()
