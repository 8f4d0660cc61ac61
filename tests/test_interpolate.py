"""Parity of interpolate_features vs the torch grid_sample reference math
(utils/functions.py:55-76). torch (CPU) is available in this image, so the
test re-derives the expected output with torch directly."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gd3d.ops import interpolate_features, grid_sample_bilinear


def torch_reference(descriptors, pts, h, w, normalize, patch_size, stride):
    descriptors = torch.from_numpy(descriptors)
    pts = torch.from_numpy(pts)
    last_coord_h = ((h - patch_size) // stride) * stride + (patch_size / 2)
    last_coord_w = ((w - patch_size) // stride) * stride + (patch_size / 2)
    ah = 2 / (last_coord_h - (patch_size / 2))
    aw = 2 / (last_coord_w - (patch_size / 2))
    bh = 1 - last_coord_h * 2 / (last_coord_h - (patch_size / 2))
    bw = 1 - last_coord_w * 2 / (last_coord_w - (patch_size / 2))
    a = torch.tensor([[aw, ah]]).to(pts).float()
    b = torch.tensor([[bw, bh]]).to(pts).float()
    keypoints = (a * pts + b).unsqueeze(-3)
    out = F.grid_sample(
        descriptors, keypoints, align_corners=True, padding_mode="border"
    ).squeeze(-2)
    if normalize:
        out = F.normalize(out, dim=1)
    return out.numpy()


def test_interpolate_features_matches_torch():
    rng = np.random.RandomState(1)
    B, C, ph, pw = 2, 16, 10, 12
    patch, stride = 16, 16
    h, w = ph * patch, pw * patch
    desc = rng.randn(B, C, ph, pw).astype(np.float32)
    # mix of interior, border and out-of-range points
    pts = rng.uniform(-10, max(h, w) + 10, size=(B, 25, 2)).astype(np.float32)

    for normalize in [False, True]:
        want = torch_reference(desc, pts, h, w, normalize, patch, stride)
        got = np.asarray(
            interpolate_features(
                jnp.asarray(desc), jnp.asarray(pts), h, w,
                normalize=normalize, patch_size=patch, stride=stride,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_interpolate_features_stride8_tracking_geometry():
    # tracking eval uses stride = patch//2 (src/evaluate_timm.py:235-236)
    rng = np.random.RandomState(2)
    patch, stride = 16, 8
    h, w = 80, 96
    ph = 1 + (h - patch) // stride
    pw = 1 + (w - patch) // stride
    desc = rng.randn(1, 8, ph, pw).astype(np.float32)
    pts = rng.uniform(0, min(h, w), size=(1, 13, 2)).astype(np.float32)
    want = torch_reference(desc, pts, h, w, True, patch, stride)
    got = np.asarray(
        interpolate_features(
            jnp.asarray(desc), jnp.asarray(pts), h, w,
            normalize=True, patch_size=patch, stride=stride,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_border_padding():
    img = jnp.arange(12.0).reshape(1, 3, 4)
    # far out of range clamps to corners (border padding)
    coords = jnp.asarray([[-5.0, -5.0], [5.0, 5.0]])
    out = np.asarray(grid_sample_bilinear(img, coords))
    assert out[0, 0] == 0.0
    assert out[0, 1] == 11.0
