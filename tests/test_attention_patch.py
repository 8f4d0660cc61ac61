"""The flash bwd_dq di-broadcast patch (gd3d/ops/attention.py).

The stock pallas flash backward broadcasts the per-row di statistics to
block_k_major lanes although its BlockSpec only reads the first 128 — a
340 MB/layer HBM artifact at the student's shapes, measured ~3 ms/step
on the flagship bench (device trace, round 5). The patch recompiles the
wrapper with the broadcast at MIN_BLOCK_SIZE; math is bit-identical
(verified on-chip: dq/dk/dv vs the einsum path to 1e-8). CPU CI can only
assert the patch APPLIES — if a jax upgrade changes the source pattern,
this test fails instead of the patch silently no-opping.
"""
import numpy as np


def test_di_patch_applies_and_is_idempotent():
    import jax.experimental.pallas.ops.tpu.flash_attention as fa

    import gd3d.ops.attention as att

    att._DI_PATCHED = False  # force re-run in case another test ran first
    att._patch_flash_dq_di_broadcast()
    assert getattr(fa._flash_attention_bwd_dq, "_gd3d_di_patched", False), (
        "di-broadcast pattern not found in this jax version — the patch "
        "no-opped; re-derive it against the new flash_attention source "
        "(or delete it if upstream fixed the broadcast)"
    )
    patched = fa._flash_attention_bwd_dq
    att._DI_PATCHED = False
    att._patch_flash_dq_di_broadcast()  # second run must not re-wrap
    assert fa._flash_attention_bwd_dq is patched


def test_flash_grads_match_einsum_path():
    """Runs the full kernel only on TPU; on the CPU test platform both
    sides take the einsum path, so this degenerates to a smoke check."""
    import jax
    import jax.numpy as jnp

    from gd3d.ops.attention import scaled_dot_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(1, 200, 2, 64), jnp.float32)
    k = jnp.asarray(rng.randn(1, 200, 2, 64), jnp.float32)
    v = jnp.asarray(rng.randn(1, 200, 2, 64), jnp.float32)

    def loss(force):
        def f(q, k, v):
            return (scaled_dot_attention(q, k, v,
                                         force_xla=force) ** 2).mean()

        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)

    for a, b in zip(loss(False), loss(True)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)


def test_fused_bwd_kernel_matches_einsum_interpret():
    """The one-pass dq+dk+dv kernel (gd3d/kernels/flash_bwd_fused.py) vs
    einsum autodiff, run in pallas interpret mode so CPU CI covers the
    kernel math (on-chip the same kernel was verified to ~1e-10 at the
    flagship shapes)."""
    import jax
    import jax.numpy as jnp

    from gd3d.kernels.flash_bwd_fused import flash_attention_bwd_fused

    rng = np.random.RandomState(3)
    B, H, N, D = 1, 2, 256, 64
    scale = 0.125
    q = jnp.asarray(rng.randn(B, H, N, D) * 0.5, jnp.float32)
    k = jnp.asarray(rng.randn(B, H, N, D) * 0.5, jnp.float32)
    v = jnp.asarray(rng.randn(B, H, N, D) * 0.5, jnp.float32)
    do = jnp.asarray(rng.randn(B, H, N, D) * 0.5, jnp.float32)

    def ref_fwd(q, k, v):
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        return jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(logits, -1), v)

    o, pullback = jax.vjp(ref_fwd, q, k, v)
    dq_want, dk_want, dv_want = pullback(do)

    # residuals exactly as the stock flash forward defines them
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
    m = logits.max(-1)
    l = jnp.exp(logits - m[..., None]).sum(-1)
    di = jnp.sum(o * do, axis=-1)

    dq, dk, dv = flash_attention_bwd_fused(
        q, k, v, None, l, m, do, di,
        block_q_major=128, block_q=128, block_k_major=128, block_k=128,
        sm_scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_want),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_want),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_want),
                               rtol=1e-4, atol=2e-5)


def test_tile_plan_invariants():
    """Every plan (measured table + fallback rule) must tile legally:
    pads are 128-multiples >= the real length, fwd/bwd majors divide the
    pad, inners divide their major, and nothing exceeds the pad."""
    from gd3d.ops.attention import _TILE_PLANS, _tile_plan

    lengths = sorted({1, 8, 64, 200, 672, 673, 1024, 1025, 1370, 1374,
                      2748, 4161, 6656, *(_TILE_PLANS.keys())})
    for n in lengths:
        for m in lengths:
            pad_n, pad_m, (bq, bkM, bk), (bqM, bq_i, bkM_b, bk_b) = (
                _tile_plan(n, m))
            assert pad_n >= n and pad_m >= m
            assert pad_n % 128 == 0 and pad_m % 128 == 0
            # clamp exactly as _flash_sdpa does before the kernel call
            bq, bkM, bk = min(bq, pad_n), min(bkM, pad_m), min(bk, pad_m)
            bqM, bq_i = min(bqM, pad_n), min(bq_i, pad_n)
            bkM_b, bk_b = min(bkM_b, pad_m), min(bk_b, pad_m)
            assert pad_n % bq == 0, (n, m, bq)
            assert pad_m % bkM == 0 and bkM % bk == 0, (n, m, bkM, bk)
            assert pad_n % bqM == 0 and bqM % bq_i == 0, (n, m, bqM, bq_i)
            assert pad_m % bkM_b == 0 and bkM_b % bk_b == 0
            for b in (bq, bkM, bk, bqM, bq_i, bkM_b, bk_b):
                assert b % 128 == 0 or b == pad_n or b == pad_m, (n, m, b)
