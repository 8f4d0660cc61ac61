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


def test_kth_smallest_matches_sort():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gd3d.ops.basic import kth_smallest

    rng = np.random.RandomState(0)
    cases = [
        rng.randn(1000).astype(np.float32),              # mixed signs
        np.abs(rng.randn(172032)).astype(np.float32),    # conf-map scale
        rng.randint(0, 5, 513).astype(np.float32),       # heavy ties
        np.concatenate([np.zeros(7, np.float32) - 0.0,
                        np.zeros(9, np.float32),
                        rng.randn(100).astype(np.float32)]),
        np.float32([3.0]),
    ]
    for x in cases:
        srt = np.sort(x)
        for k in {kk for kk in (0, 1, len(x) // 10, len(x) // 2,
                                len(x) - 1) if kk < len(x)}:
            got = np.asarray(jax.jit(kth_smallest, static_argnums=())(
                jnp.asarray(x), k))
            assert got == srt[k], (len(x), k, got, srt[k])


def test_kth_smallest_no_grad_and_traced_k():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gd3d.ops.basic import kth_smallest

    x = jnp.asarray(np.random.RandomState(1).randn(64), jnp.float32)
    g = jax.grad(lambda v: kth_smallest(v, 10).sum())(x)
    assert float(jnp.abs(g).sum()) == 0.0
    ks = jnp.arange(3)
    vals = jax.vmap(lambda k: kth_smallest(x, k))(ks)
    want = jnp.sort(x)[:3]
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(want))
