"""On-chip micro-bench: Pallas RoPE2D kernel vs the jnp (XLA) path.

Measures a 24-layer scan applying RoPE to q and k at CroCo ViT-L encoder
scale — the per-layer hot path (dust3r/croco/models/blocks.py:102-104).
Run: python scripts/probe_rope2d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gd3d.kernels.rope2d import rope2d_pallas
from gd3d.ops.rope2d import grid_positions, rope2d_xla


def bench(fn, tokens, pos, label, iters=20):
    def layer(x, _):
        q = fn(x, pos, 100.0)
        k = fn(x, pos, 100.0)
        return x + 0.0 * (q + k), None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(layer, x, None, length=24)
        return x

    out = run(tokens)
    np.asarray(out[0, 0, 0, :2])  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(tokens)
    np.asarray(out[0, 0, 0, :2])
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt * 1e3:.3f} ms / 24-layer scan "
          f"({dt / 48 * 1e6:.1f} us per rope call)")
    return dt


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    # CroCo ViT-L encoder at 512x336: grid 32x21 = 672 tokens, 16 heads, D=64
    # symmetric pair batch of 4 (2 pairs x 2 directions)
    B, H, N, D = 4, 16, 672, 64
    gh, gw = 21, 32
    tokens = jnp.asarray(rng.randn(B, H, N, D), jnp.float32)
    pos = grid_positions(gh, gw, B)

    t_xla = bench(rope2d_xla, tokens, pos, "jnp/XLA  ")
    t_pal = bench(rope2d_pallas, tokens, pos, "pallas   ")
    print(f"speedup: {t_xla / t_pal:.2f}x")

    # parity on the real chip (compiled kernel, not interpret mode)
    a = rope2d_xla(tokens, pos, 100.0)
    b = rope2d_pallas(tokens, pos, 100.0)
    err = float(jnp.abs(a - b).max())
    print(f"max |pallas - xla| on chip: {err:.2e}")
    assert err < 1e-5


if __name__ == "__main__":
    main()
