"""Fused pairwise-ranking kernel vs the jnp reference path.

The kernel (gd3d/kernels/pairwise_rank.py) fuses the DepthAwareFeatureFusion
pairwise score chain + logistic ranking loss; the oracle is the original
composition Student.pairwise_score_diff -> pairwise_logistic_ranking_loss.
Runs the Pallas kernel in interpret mode (CPU-safe), including the
custom-vjp backward kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gd3d.core.config import StudentConfig
from gd3d.kernels.pairwise_rank import (
    _pairwise_rank_sums,
    pairwise_ranking_sums_fused,
)
from gd3d.models.student import Student
from gd3d.ops.losses import pairwise_logistic_ranking_loss

H_DIM = 128
N = 96  # deliberately NOT a multiple of the 64-wide kernel tiles
THR = 0.05


def _setup(seed=0, n=N, h=H_DIM):
    rng = np.random.RandomState(seed)
    u = jnp.asarray(rng.randn(2, n, h) * 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(h) * 0.1, jnp.float32)
    ln_s = jnp.asarray(1.0 + rng.randn(h) * 0.05, jnp.float32)
    ln_b = jnp.asarray(rng.randn(h) * 0.05, jnp.float32)
    w_out = jnp.asarray(rng.randn(h) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.randn(1) * 0.1, jnp.float32)
    depths = jnp.asarray(rng.rand(2, n) * 3, jnp.float32)
    valid = jnp.asarray(rng.rand(2, n) > 0.25)
    return u, bias, ln_s, ln_b, w_out, b_out, depths, valid


def _oracle_sums(u, bias, ln_s, ln_b, w_out, b_out, depths, valid):
    """Same math through plain jnp (mirrors pairwise_score_diff+ranking)."""
    diff = u[:, None, :, :] - u[:, :, None, :] + bias
    mu = jnp.mean(diff, -1, keepdims=True)
    var = jnp.mean((diff - mu) ** 2, -1, keepdims=True)
    y = (diff - mu) * jax.lax.rsqrt(var + 1e-5) * ln_s + ln_b
    g = 0.5 * y * (1.0 + jax.lax.erf(y / jnp.sqrt(2.0)))
    score = jnp.tanh(jnp.sum(g * w_out, -1) + b_out[0])
    di, dj = depths[:, :, None], depths[:, None, :]
    alpha = jnp.sign(dj - di)
    pv = ((jnp.abs(dj - di) > THR) & valid[:, :, None]
          & valid[:, None, :]).astype(jnp.float32)
    loss = jnp.log1p(jnp.exp(-alpha * score))
    return jnp.sum(loss * pv, (1, 2)), jnp.sum(pv, (1, 2))


def test_fused_forward_matches_oracle():
    args = _setup()
    s_ref, c_ref = _oracle_sums(*args)
    s_k, c_k = pairwise_ranking_sums_fused(*args, THR, interpret=True)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_ref), rtol=0)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=2e-5, atol=2e-4)


def test_fused_backward_matches_oracle():
    args = _setup(1)

    def loss_fused(u, bias, ln_s, ln_b, w_out, b_out):
        s, c = _pairwise_rank_sums(u, bias, ln_s, ln_b, w_out, b_out,
                                   args[6], args[7], THR, 1e-5, True)
        return jnp.sum(s) / jnp.sum(c) + 0.5 * s[0]

    def loss_ref(u, bias, ln_s, ln_b, w_out, b_out):
        s, c = _oracle_sums(u, bias, ln_s, ln_b, w_out, b_out,
                            args[6], args[7])
        return jnp.sum(s) / jnp.sum(c) + 0.5 * s[0]

    g_k = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(*args[:6])
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(*args[:6])
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6)


def test_fused_all_invalid_is_zero():
    u, bias, ln_s, ln_b, w_out, b_out, depths, valid = _setup(2)
    valid = jnp.zeros_like(valid)
    s, c = pairwise_ranking_sums_fused(
        u, bias, ln_s, ln_b, w_out, b_out, depths, valid, THR,
        interpret=True)
    assert float(jnp.sum(c)) == 0.0
    assert float(jnp.sum(s)) == 0.0


@pytest.mark.parametrize("n", [64, 96, 128])
def test_student_intra_depth_loss_paths_agree(n):
    """Student.intra_depth_loss jnp fallback == the fused kernel combined
    the same way (per-view masked means averaged)."""
    cfg = StudentConfig(
        embed_dim=64, depth=2, num_heads=2, patch_size=8,
        pretrain_img_size=32, lora_start_block=0, use_adapters=False,
        adapter_bottleneck=8, target_res=32, depth_head_hidden=H_DIM,
    )
    student = Student(cfg)
    params = student.init(jax.random.key(0), img_size=32)
    rng = np.random.RandomState(3)
    feats = jnp.asarray(rng.randn(2, n, cfg.embed_dim), jnp.float32)
    depths = jnp.asarray(rng.rand(2, n), jnp.float32)
    valid = jnp.asarray(rng.rand(2, n) > 0.3)

    # jnp fallback (CPU backend -> fused branch not taken)
    ref = student.intra_depth_loss(params, feats, depths, valid, THR)

    # fused path, forced through interpret mode with the same params
    dh = params["depth_diff_head"]
    u = feats @ dh["fusion_in"]["kernel"] + dh["fusion_in"]["bias"]
    s, c = pairwise_ranking_sums_fused(
        u, dh["fusion_in"]["bias"], dh["fusion_ln"]["scale"],
        dh["fusion_ln"]["bias"], dh["fusion_out"]["kernel"][:, 0],
        dh["fusion_out"]["bias"], depths, valid, THR, interpret=True)

    def vm(s, c):
        tot, cnt = jnp.sum(s), jnp.sum(c)
        return jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1.0), 0.0)

    got = (vm(s[:1], c[:1]) + vm(s[1:], c[1:])) / 2.0
    np.testing.assert_allclose(float(got), float(ref), rtol=3e-5, atol=1e-6)
