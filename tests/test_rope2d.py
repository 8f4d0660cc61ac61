"""RoPE2D parity: jnp reference vs torch transcription of
dust3r/croco/models/pos_embed.py:112-159, and Pallas kernel (interpret mode)
vs the jnp reference. Backward must equal rotation by -theta."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from gd3d.kernels.rope2d import rope2d_pallas
from gd3d.ops.rope2d import grid_positions, rope2d


def torch_rope2d(tokens, positions, base=100.0):
    # transcription of the reference torch fallback
    tokens = torch.from_numpy(tokens)
    positions = torch.from_numpy(positions)
    D = tokens.size(3) // 2

    def get_cos_sin(D_, seq_len):
        inv_freq = 1.0 / (base ** (torch.arange(0, D_, 2).float() / D_))
        t = torch.arange(seq_len, dtype=inv_freq.dtype)
        freqs = torch.einsum("i,j->ij", t, inv_freq)
        freqs = torch.cat((freqs, freqs), dim=-1)
        return freqs.cos(), freqs.sin()

    def rotate_half(x):
        x1, x2 = x[..., : x.shape[-1] // 2], x[..., x.shape[-1] // 2:]
        return torch.cat((-x2, x1), dim=-1)

    def apply_rope1d(tok, pos1d, cos, sin):
        cos = torch.nn.functional.embedding(pos1d, cos)[:, None, :, :]
        sin = torch.nn.functional.embedding(pos1d, sin)[:, None, :, :]
        return (tok * cos) + (rotate_half(tok) * sin)

    cos, sin = get_cos_sin(D, int(positions.max()) + 1)
    y, x = tokens.chunk(2, dim=-1)
    y = apply_rope1d(y, positions[:, :, 0], cos, sin)
    x = apply_rope1d(x, positions[:, :, 1], cos, sin)
    return torch.cat((y, x), dim=-1).numpy()


def _data(B=2, H=3, N=24, D=16, h=4, w=6):
    rng = np.random.RandomState(0)
    tokens = rng.randn(B, H, N, D).astype(np.float32)
    pos = np.asarray(grid_positions(h, w, B)).astype(np.int64)
    return tokens, pos


def test_rope2d_matches_torch_reference():
    tokens, pos = _data()
    want = torch_rope2d(tokens, pos)
    got = np.asarray(rope2d(jnp.asarray(tokens), jnp.asarray(pos)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rope2d_backward_is_inverse_rotation():
    tokens, pos = _data()
    t = jnp.asarray(tokens)
    p = jnp.asarray(pos)
    # VJP of a rotation is rotation by -theta: <R g, t> == <g, R^T t>
    g = jnp.asarray(np.random.RandomState(1).randn(*tokens.shape), jnp.float32)
    _, vjp = jax.vjp(lambda x: rope2d(x, p), t)
    (grad,) = vjp(g)
    want = rope2d(g, p, 100.0, -1.0)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want), rtol=1e-5)


def test_rope2d_pallas_matches_reference():
    tokens, pos = _data(B=1, H=2, N=300, D=32, h=15, w=20)
    want = np.asarray(rope2d(jnp.asarray(tokens), jnp.asarray(pos)))
    got = np.asarray(
        rope2d_pallas(jnp.asarray(tokens), jnp.asarray(pos), 100.0, 1.0, True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_rope2d_pallas_grad_matches_reference():
    tokens, pos = _data(B=1, H=2, N=256, D=32, h=16, w=16)
    t, p = jnp.asarray(tokens), jnp.asarray(pos)
    loss_ref = lambda x: jnp.sum(rope2d(x, p) ** 2)
    loss_pal = lambda x: jnp.sum(rope2d_pallas(x, p, 100.0, 1.0, True) ** 2)
    g_ref = jax.grad(loss_ref)(t)
    g_pal = jax.grad(loss_pal)(t)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-6
    )
