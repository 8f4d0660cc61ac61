"""Sweep flash-attention block sizes (fwd+bwd) at the flagship student's
attention shapes on the real chip.

The MASt3R distill step's largest component is the student ViT-B fwd+bwd at
~4161 tokens (832x1280 resize / stride-16 grid + cls, padded to 4608 by the
flash dispatch). PERF_NOTES pinned 512-token blocks from a FORWARD-only
sweep in round 1; the backward kernels (dkv/dq) have their own block
parameters and may prefer different tilings.

Measurement method: the axon tunnel adds ~30-40 ms per dispatch, so each
candidate runs L=12 attention layers inside ONE jitted lax.scan (exactly how
the model consumes the kernel) and reports per-layer time.

Run: python scripts/probe_attention.py [iters]
"""
from __future__ import annotations

import functools
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = 12  # layers per dispatch (ViT-B depth)


def make_flash(block_q, block_k, block_q_bwd, block_k_bwd):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    def one(q, k, v):
        N = q.shape[2]
        bq, bk = min(block_q, N), min(block_k, N)
        bqb, bkb = min(block_q_bwd, N), min(block_k_bwd, N)
        sizes = BlockSizes(
            block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
            block_q_major_dkv=bqb, block_k_major_dkv=bkb,
            block_k_dkv=bkb, block_q_dkv=bqb,
            block_k_major_dq=bkb, block_k_dq=bkb, block_q_dq=bqb,
        )
        return flash_attention(q, k, v, causal=False, sm_scale=0.125,
                               block_sizes=sizes)

    return one


def xla_attn(q, k, v):
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * 0.125, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def scan_loss(attn_fn, q, k, v):
    def body(x, _):
        o = attn_fn(x, k, v)
        return o, ()

    out, _ = jax.lax.scan(body, q, None, length=L)
    return (out.astype(jnp.float32) ** 2).mean()


def main():
    global jax, jnp
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.RandomState(0)
    shapes = [
        ("student-4608", 2, 12, 4608, 64),
        ("student-B4", 4, 12, 4608, 64),    # batch=2 pairs
        ("student-6656", 2, 12, 6656, 64),  # VGGT 640-target geometry
    ]
    only = os.environ.get("GD3D_PROBE_SHAPE")
    if only:
        shapes = [s for s in shapes if s[0] == only]
    for label, B, H, N, D in shapes:
        q = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
        flops_layer = 2 * 2 * B * H * N * N * D  # fwd qk + av
        print(f"== {label}: B={B} H={H} N={N} D={D} bf16, {L}-layer scan, "
              f"fwd+bwd, per-layer times ==", flush=True)

        if N == 6656:
            candidates = [
                dict(block_q=512, block_k=512, block_q_bwd=512,
                     block_k_bwd=512),
                dict(block_q=832, block_k=832, block_q_bwd=832,
                     block_k_bwd=832),
                dict(block_q=1664, block_k=1664, block_q_bwd=1664,
                     block_k_bwd=1664),
            ]
        else:
            candidates = [
                dict(block_q=512, block_k=512, block_q_bwd=512,
                     block_k_bwd=512),
                dict(block_q=768, block_k=768, block_q_bwd=768,
                     block_k_bwd=768),
                dict(block_q=512, block_k=768, block_q_bwd=512,
                     block_k_bwd=768),
                dict(block_q=768, block_k=512, block_q_bwd=768,
                     block_k_bwd=512),
                dict(block_q=512, block_k=512, block_q_bwd=768,
                     block_k_bwd=768),
                dict(block_q=768, block_k=768, block_q_bwd=512,
                     block_k_bwd=512),
                dict(block_q=1152, block_k=1152, block_q_bwd=1152,
                     block_k_bwd=1152),
                dict(block_q=512, block_k=512, block_q_bwd=256,
                     block_k_bwd=256),
                dict(block_q=256, block_k=256, block_q_bwd=256,
                     block_k_bwd=256),
            ]
        for c in candidates:
            try:
                fn = jax.jit(jax.grad(
                    functools.partial(scan_loss, make_flash(**c)),
                    argnums=(0, 1, 2)))
                out = fn(q, k, v)
                np.asarray(out[0]).reshape(-1)[0]
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(q, k, v)
                np.asarray(out[0]).reshape(-1)[0]
                dt = (time.perf_counter() - t0) / iters / L
                # fwd+bwd ~ 3.5x fwd FLOPs (flash bwd recomputes)
                mfu = 3.5 * flops_layer / dt / 197e12
                print(f"  flash {tuple(c.values())}: {dt * 1e3:.2f} ms/layer "
                      f"(~{mfu * 100:.0f}% MFU)", flush=True)
            except Exception as e:
                print(f"  flash {tuple(c.values())}: FAILED "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)

        try:
            fn = jax.jit(jax.grad(functools.partial(scan_loss, xla_attn),
                                  argnums=(0, 1, 2)))
            out = fn(q, k, v)
            np.asarray(out[0]).reshape(-1)[0]
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(q, k, v)
            np.asarray(out[0]).reshape(-1)[0]
            dt = (time.perf_counter() - t0) / iters / L
            print(f"  xla einsum+softmax: {dt * 1e3:.2f} ms/layer", flush=True)
        except Exception as e:
            print(f"  xla: FAILED {type(e).__name__}: {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()
