import jax.numpy as jnp
import numpy as np

from gd3d.ops import temp_sigmoid, l2_normalize


def test_temp_sigmoid_matches_formula():
    x = np.linspace(-3, 3, 31).astype(np.float32)
    got = np.asarray(temp_sigmoid(jnp.asarray(x), temp=0.01))
    exponent = np.clip(-x / 0.01, -50, 50)
    want = 1.0 / (1.0 + np.exp(exponent))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_temp_sigmoid_clamps():
    # exponent clamp at +/-50 (utils/functions.py:31)
    big = jnp.asarray([1e6, -1e6], dtype=jnp.float32)
    y = np.asarray(temp_sigmoid(big, temp=1.0))
    np.testing.assert_allclose(y[0], 1.0 / (1.0 + np.exp(-50.0)), rtol=1e-5)
    np.testing.assert_allclose(y[1], 1.0 / (1.0 + np.exp(50.0)), rtol=1e-5)


def test_l2_normalize():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 7).astype(np.float32)
    got = np.asarray(l2_normalize(jnp.asarray(x), axis=-1))
    want = x / np.linalg.norm(x, axis=-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # zero vector stays finite
    z = np.asarray(l2_normalize(jnp.zeros((3,)), axis=-1))
    assert np.all(np.isfinite(z))
