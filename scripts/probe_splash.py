"""Splash-attention kernel vs the stock flash kernel at student shapes.

After head-packing measured a wash (probe_head_packing.py), the remaining
attention-kernel candidate in this jax version is
jax.experimental.pallas.ops.tpu.splash_attention (newer kernel generation,
different tilings/pipeline). Full-mask MHA, fwd+bwd, 12-layer scan, bf16.

Run: python scripts/probe_splash.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = 12


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    from gd3d.ops.attention import _flash_sdpa

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.RandomState(0)

    for label, B, N in (("student-4608", 2, 4608), ("vggt-6656", 2, 6656)):
        H, D = 12, 64
        scale = D**-0.5
        q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        flops_layer = 2 * 2 * B * H * N * N * D

        mask = sm.MultiHeadMask(
            [sm.FullMask((N, N)) for _ in range(H)])
        kernel = sk.make_splash_mha(
            mask=mask, head_shards=1, q_seq_shards=1)

        def splash(qi, ki, vi):
            # splash wants (H, N, D) per batch element; scale q ourselves
            out = jax.vmap(kernel)(
                (qi * scale).transpose(0, 2, 1, 3),
                ki.transpose(0, 2, 1, 3),
                vi.transpose(0, 2, 1, 3),
            )
            return out.transpose(0, 2, 1, 3)

        def stock(qi, ki, vi):
            return _flash_sdpa(qi, ki, vi, scale)

        # parity
        o_ref = np.asarray(jax.jit(stock)(q, k, v), np.float32)
        o_spl = np.asarray(jax.jit(splash)(q, k, v), np.float32)
        err = np.abs(o_ref - o_spl).max()
        print(f"== {label}: max|splash-stock|={err:.2e} ==", flush=True)

        def scan_loss(attn, q, k, v):
            def body(x, _):
                return attn(x, k, v), ()

            out, _ = jax.lax.scan(body, q, None, length=L)
            return (out.astype(jnp.float32) ** 2).mean()

        for name, fn in (("stock ", stock), ("splash", splash)):
            try:
                g = jax.jit(jax.grad(
                    lambda q, k, v, fn=fn: scan_loss(fn, q, k, v),
                    argnums=(0, 1, 2)))
                out = g(q, k, v)
                np.asarray(out[0]).reshape(-1)[0]
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = g(q, k, v)
                np.asarray(out[0]).reshape(-1)[0]
                dt = (time.perf_counter() - t0) / iters / L
                mfu = 3.5 * flops_layer / dt / 197e12
                print(f"  {name} fwd+bwd: {dt * 1e3:.2f} ms/layer "
                      f"(~{mfu * 100:.0f}% MFU)", flush=True)
            except Exception as e:
                print(f"  {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
