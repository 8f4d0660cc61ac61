"""Head-packed flash attention (2x64-dim heads per 128-lane MXU tile) vs
the stock kernel, on the real chip.

The named round-3 lever (VERDICT r2 item 1): head_dim 64 underfills the
MXU's 128-wide tiles, so the stock flash kernel runs ~18-19% MFU standalone
on the ViT-B student. gd3d/ops/attention.py::_flash_sdpa_head_packed packs
head pairs as block-diagonal queries + concatenated KV, making the QK
contraction 128-wide at the same FLOP count. This probe measures:

  1. a matmul microbench isolating the K-dim underfill hypothesis,
  2. stock vs packed fwd+bwd per-layer time at the student's real shapes
     (including the dispatcher's padding/segment handling),
  3. numerical parity packed vs stock.

Run: python scripts/probe_head_packing.py [iters]
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

    from gd3d.ops.attention import _flash_sdpa, _flash_sdpa_head_packed

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.RandomState(0)

    # ---- 1. matmul microbench: same FLOPs, varying contraction dim -------
    print("== matmul microbench (bf16, 4608xKx4608, R-scanned) ==",
          flush=True)
    R = 8
    for K in (64, 128, 256):
        a = jnp.asarray(rng.randn(R, 4608, K), jnp.bfloat16)
        b = jnp.asarray(rng.randn(R, K, 4608), jnp.bfloat16)

        def scanned(a, b):
            def body(c, ab):
                x, y = ab
                return c + (x @ y).astype(jnp.float32).mean(), ()

            tot, _ = jax.lax.scan(body, 0.0, (a, b))
            return tot

        f = jax.jit(scanned)
        float(f(a, b))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(a, b)
        float(out)
        dt = (time.perf_counter() - t0) / iters / R
        tf = 2 * 4608 * 4608 * K / dt / 1e12
        print(f"  K={K:4d}: {dt * 1e6:7.1f} us  {tf:6.1f} TFLOPS "
              f"({tf / 197 * 100:4.1f}% of bf16 peak)", flush=True)

    # ---- 2+3. stock vs packed at student shapes --------------------------
    for label, B, N in (("student-4161", 2, 4161), ("vggt-6401", 2, 6401),
                        ("aligned-4608", 2, 4608)):
        H, D = 12, 64
        q = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, N, H, D), jnp.bfloat16)
        scale = D**-0.5
        flops_layer = 2 * 2 * B * H * N * N * D

        # parity (fwd)
        o_ref = np.asarray(
            jax.jit(lambda a, b, c: _flash_sdpa(a, b, c, scale))(q, k, v),
            np.float32)
        o_pack = np.asarray(
            jax.jit(lambda a, b, c: _flash_sdpa_head_packed(a, b, c, scale))(
                q, k, v), np.float32)
        err = np.abs(o_ref - o_pack).max()
        print(f"== {label}: B={B} N={N} H={H} D={D} bf16 | packed-vs-stock "
              f"max|diff|={err:.2e} ==", flush=True)
        assert err < 0.02, "packed kernel diverges from stock"

        def scan_loss(attn, q, k, v):
            def body(x, _):
                return attn(x, k, v), ()

            out, _ = jax.lax.scan(body, q, None, length=L)
            return (out.astype(jnp.float32) ** 2).mean()

        for name, fn in (("stock ", _flash_sdpa),
                         ("packed", _flash_sdpa_head_packed)):
            g = jax.jit(jax.grad(
                lambda q, k, v, fn=fn: scan_loss(
                    lambda a, b, c: fn(a, b, c, scale), q, k, v),
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


if __name__ == "__main__":
    main()
