"""Does int8 pay on the v5e MXU through XLA? Microbenchmark before any
quantized-teacher work (the honesty bar: measure the primitive first).

v5e peak: 197 bf16 TFLOPS vs 394 int8 TOPS — a 2x ceiling IF XLA lowers
int8 `dot_general` onto the int8 MXU path. MEASURED RESULT (2026-08-17,
jax 0.x in this image, axon tunnel): it does NOT — int8 dots run ~0.2
TOPS, ~35x SLOWER than the same-shape bf16 matmul (XLA upcasts and runs
off the fast path). A quantized-teacher path is therefore dead on this
stack; revisit only when `jax.lax.dot(int8, int8, preferred_element_type
=int32)` measures near 2x bf16 here.

Measurement gotchas baked into this probe (each one silently corrupted an
earlier version):
  1. xs-scan over DISTINCT per-iteration inputs — a loop-invariant dot is
     hoisted by XLA (time divided by R).
  2. MAX-accumulate, not +: summed dots are distributive
     (sum_i dot(a_i, b) = dot(sum a_i, b)) and XLA collapses R dots into
     one — measured 63k "TOPS" on a 394-TOP chip before this fix.
  3. FRESH input arrays for every timed call: re-dispatching a jitted fn
     on the SAME input buffers through the axon tunnel returns in ~0.1 ms
     (faster than one ~28 ms tunnel round trip — upstream result caching),
     so same-input timing loops measure nothing.
  4. Sync with np.asarray(out[0, 0]), matching the repo's other probes.

Run: python scripts/probe_int8_matmul.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")

    # ViT-L teacher matmul shapes at the 336x512 ScanNet++ geometry
    shapes = [
        (1360, 1024, 1024),   # qkv/proj
        (1360, 1024, 4096),   # mlp up
        (1360, 4096, 1024),   # mlp down
    ]
    R = 20

    def stacks(seed, m, k, n):
        r = np.random.RandomState(seed)
        return (jnp.asarray(r.randint(-127, 127, (R, m, k), np.int8)),
                jnp.asarray(r.randint(-127, 127, (k, n), np.int8)),
                jnp.asarray(r.randn(R, m, k), jnp.bfloat16),
                jnp.asarray(r.randn(k, n), jnp.bfloat16))

    for (m, k, n) in shapes:
        @jax.jit
        def f_i8(a_stack, b):
            def body(c, a):
                d = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
                return jnp.maximum(c, d), None
            return jax.lax.scan(body, jnp.zeros((m, n), jnp.int32),
                                a_stack)[0]

        @jax.jit
        def f_bf(a_stack, b):
            def body(c, a):
                d = jax.lax.dot(a, b, preferred_element_type=jnp.float32)
                return jnp.maximum(c, d), None
            return jax.lax.scan(body, jnp.zeros((m, n), jnp.float32),
                                a_stack)[0]

        a8, b8, abf, bbf = stacks(0, m, k, n)
        np.asarray(f_i8(a8, b8)[0, 0])   # compile
        np.asarray(f_bf(abf, bbf)[0, 0])
        flop = 2 * m * k * n * R
        for trial in range(2):
            a8, b8, abf, bbf = stacks(trial + 1, m, k, n)  # fresh inputs
            t0 = time.perf_counter()
            np.asarray(f_i8(a8, b8)[0, 0])
            d8 = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f_bf(abf, bbf)[0, 0])
            dbf = time.perf_counter() - t0
            print(f"({m:5d},{k:5d},{n:5d}) trial {trial}: "
                  f"int8 {d8 * 1e3 / R:7.3f} ms/mm ({flop / d8 / 1e12:5.1f} "
                  f"TOPS) | bf16 {dbf * 1e3 / R:7.3f} ms/mm "
                  f"({flop / dbf / 1e12:5.1f} TFLOPS)", flush=True)


if __name__ == "__main__":
    main()
