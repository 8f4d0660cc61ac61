"""Ring / all-gather-KV sequence-parallel attention vs single-device
attention on the 8-device CPU mesh."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gd3d.core.mesh import make_mesh
from gd3d.parallel.sequence import allgather_kv_attention, ring_attention


def _reference(q, k, v, scale):
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", a, v)


def _data(B=1, N=64, H=2, D=8, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    return mk(), mk(), mk()


@pytest.mark.slow
def test_ring_attention_matches_reference():
    mesh = make_mesh()  # 8 x 1
    q, k, v = _data()
    scale = q.shape[-1] ** -0.5
    want = np.asarray(_reference(q, k, v, scale))
    got = np.asarray(ring_attention(q, k, v, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_allgather_kv_attention_matches_reference():
    mesh = make_mesh()
    q, k, v = _data(seed=1)
    scale = q.shape[-1] ** -0.5
    want = np.asarray(_reference(q, k, v, scale))
    got = np.asarray(allgather_kv_attention(q, k, v, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ring_attention_under_jit_sharded_inputs():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()
    q, k, v = _data(seed=2)
    spec = NamedSharding(mesh, P(None, "data", None, None))
    qs, ks, vs = (jax.device_put(x, spec) for x in (q, k, v))
    f = jax.jit(lambda a, b, c: ring_attention(a, b, c, mesh))
    got = np.asarray(f(qs, ks, vs))
    want = np.asarray(_reference(q, k, v, q.shape[-1] ** -0.5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
