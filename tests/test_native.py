"""Native host-runtime library: builds (when toolchain present) and matches
the numpy reference implementations bit-for-bit-ish."""
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

from gd3d import native_runtime as nr

ROOT = Path(__file__).resolve().parent.parent


def _ensure_built() -> bool:
    if nr.available():
        return True
    if shutil.which("g++") is None:
        return False
    subprocess.run([str(ROOT / "native" / "build.sh")], check=True)
    nr._lib = None
    return nr.available()


pytestmark = pytest.mark.skipif(
    not _ensure_built(), reason="native toolchain unavailable"
)


def test_resize_matches_numpy():
    rng = np.random.RandomState(0)
    img = rng.rand(37, 53, 3).astype(np.float32)
    a = nr.resize_bilinear(img, (64, 96))
    b = nr._resize_numpy(img, (64, 96))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # downscale path
    a = nr.resize_bilinear(img, (17, 20))
    b = nr._resize_numpy(img, (17, 20))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_resize_matches_jax_resize():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    img = rng.rand(24, 30, 3).astype(np.float32)
    a = nr.resize_bilinear(img, (48, 60))
    b = np.asarray(
        jax.image.resize(jnp.asarray(img), (48, 60, 3), method="bilinear")
    )
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_u8_norm():
    rng = np.random.RandomState(2)
    u8 = rng.randint(0, 255, (16, 16, 3), np.uint8)
    mean = [0.48, 0.45, 0.4]
    std = [0.26, 0.26, 0.27]
    got = nr.u8_to_f32_norm(u8, mean, std)
    want = ((u8.astype(np.float32) / 255) - np.asarray(mean, np.float32)) / \
        np.asarray(std, np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depth_rasterization_matches_device_op():
    import jax.numpy as jnp

    from gd3d.ops.geometry import point_cloud_to_depth as device_pcd

    rng = np.random.RandomState(3)
    pts = rng.randn(500, 3).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2]) + 0.5
    K = np.array([[50.0, 0, 16], [0, 50.0, 16], [0, 0, 1]], np.float32)
    got = nr.point_cloud_to_depth(pts, K, 32, 32)
    want = np.asarray(device_pcd(jnp.asarray(pts), jnp.asarray(K), 32, 32))[0, 0]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pad_keypoints_matches_python():
    from gd3d.data.loader import pad_keypoints as py_pad

    rng = np.random.RandomState(4)
    kps = rng.rand(5, 2).astype(np.float32)
    pts = rng.rand(5, 3).astype(np.float32)
    k1, p1, v1 = nr.pad_keypoints(kps, pts, 9)
    k2, p2, v2 = py_pad(kps, pts, 9)
    np.testing.assert_allclose(k1, k2)
    np.testing.assert_allclose(p1, p2)
    np.testing.assert_array_equal(v1, v2)
