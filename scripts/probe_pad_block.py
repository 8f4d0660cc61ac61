"""Sweep PAD TARGET x block tiling for the production flash path (fused bwd).

The dispatch in gd3d/ops/attention.py pads sequence lengths to the next
512- or 768-multiple because those were the measured-fast block sizes —
but any multiple of 128 that the kernels can tile is legal, and the
flagship student's 4161 tokens waste 10.7% of attention FLOPs at 4608
when 4224 = 128x33 (+1.5%) admits (major, inner) tilings like
(1408, 128) or (4224, 384). This probe measures the REAL production path
(stock pallas fwd + gd3d fused one-pass bwd, segment-id padding masks)
across pad/block candidates at the flagship and VGGT attention shapes.

Run: python scripts/probe_pad_block.py [iters] ; GD3D_PROBE_SHAPE=<label>
to restrict. Per-layer times over an L=12-layer jitted scan (amortizes the
~30-40 ms axon dispatch latency).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

L = int(os.environ.get("GD3D_PROBE_L", "12"))


def make_padded_flash(pad_to, fwd_blocks, bwd_blocks):
    """Production-style flash fwd + fused bwd with explicit pad/tiling.

    fwd_blocks = (block_q, block_k_major, block_k)
    bwd_blocks = (block_q_major, block_q, block_k_major, block_k)
    """
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas.ops.tpu.flash_attention as fa
    from gd3d.kernels.flash_bwd_fused import flash_attention_bwd_fused

    bq_f, bkM_f, bk_f = fwd_blocks
    bqM_b, bq_b, bkM_b, bk_b = bwd_blocks

    def seg_ids(B, N, M):
        q_seg = (jnp.arange(pad_to) < N).astype(jnp.int32)[None]
        kv_seg = (jnp.arange(pad_to) < M).astype(jnp.int32)[None]
        return fa.SegmentIds(
            q=jnp.broadcast_to(q_seg, (B, pad_to)),
            kv=jnp.broadcast_to(kv_seg, (B, pad_to)),
        )

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def attn(q, k, v, n_real):
        seg = seg_ids(q.shape[0], n_real, n_real)
        return fa._flash_attention_impl(
            q, k, v, None, seg, False, False, 0.125, 1, bq_f, bkM_f, bk_f,
            False)

    def attn_fwd(q, k, v, n_real):
        seg = seg_ids(q.shape[0], n_real, n_real)
        o, l, m = fa._flash_attention_impl(
            q, k, v, None, seg, True, False, 0.125, 1, bq_f, bkM_f, bk_f,
            False)
        return o, (q, k, v, o, l, m)

    def attn_bwd(n_real, res, do):
        q, k, v, o, l, m = res
        seg = seg_ids(q.shape[0], n_real, n_real)
        di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
        dq, dk, dv = flash_attention_bwd_fused(
            q, k, v, seg, l, m, do, di,
            block_q_major=bqM_b, block_q=bq_b,
            block_k_major=bkM_b, block_k=bk_b, sm_scale=0.125)
        return dq, dk, dv

    attn.defvjp(attn_fwd, attn_bwd)

    def one(q, k, v):
        # q/k/v arrive at the REAL length; pad inside (as production does)
        N = q.shape[2]
        pad = pad_to - N
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        out = attn(qp, kp, vp, N)
        return out[:, :, :N]

    return one


def scan_loss(attn_fn, q, k, v):
    import jax
    import jax.numpy as jnp

    def body(x, _):
        o = attn_fn(x, k, v)
        return o, ()

    out, _ = jax.lax.scan(body, q, None, length=L)
    return (out.astype(jnp.float32) ** 2).mean()


def grad_scalar(attn_fn, q, k, v):
    """Single-scalar output so the probe pays ONE tunnel fetch per iter."""
    import jax
    import jax.numpy as jnp

    g = jax.grad(functools.partial(scan_loss, attn_fn), argnums=(0, 1, 2))(
        q, k, v)
    return sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in g)


def main():
    import jax
    import jax.numpy as jnp  # noqa: F401

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    rng = np.random.RandomState(0)

    # (label, B, H, N_real, D, fwd_only, candidates)
    # candidate = (pad_to, (bq, bkM, bk), (bqM, bq, bkM, bk))
    shapes = [
        ("student-1025", 2, 12, 1025, 64, False, [
            (1536, (768, 768, 768), (768, 768, 768, 768)),   # CURRENT
            (1536, (1536, 1536, 768), (1536, 768, 1536, 768)),
            (1536, (1536, 1536, 1536), (1536, 768, 1536, 768)),
            (1152, (1152, 1152, 384), (1152, 384, 1152, 384)),
            (1152, (384, 1152, 384), (1152, 384, 1152, 384)),
            (1152, (1152, 1152, 1152), (1152, 384, 1152, 384)),
            (1152, (1152, 1152, 384), (1152, 1152, 1152, 1152)),
            (1152, (384, 384, 384), (384, 384, 384, 384)),
            (1152, (1152, 1152, 384), (384, 384, 384, 384)),
        ]),
        ("student-4161", 2, 12, 4161, 64, False, [
            (4608, (768, 768, 768), (768, 768, 768, 768)),   # CURRENT
            (4608, (1536, 1536, 768), (1536, 768, 1536, 768)),
            (4608, (1536, 1536, 768), (2304, 768, 2304, 768)),
            (4608, (1536, 1536, 768), (2304, 768, 1536, 768)),
            (4608, (1536, 1536, 768), (1536, 768, 2304, 768)),
            (4608, (1536, 1536, 768), (4608, 768, 4608, 768)),
            (4608, (2304, 1536, 768), (1536, 768, 1536, 768)),
            (4608, (1536, 768, 768), (1536, 768, 1536, 768)),
            (4608, (768, 1536, 768), (1536, 768, 1536, 768)),
            (4608, (1536, 1536, 1536), (1536, 768, 1536, 768)),
        ]),
        ("vggt-student-1370", 2, 12, 1370, 64, False, [
            (1536, (768, 768, 768), (768, 768, 768, 768)),   # CURRENT
            (1536, (1536, 1536, 768), (1536, 768, 1536, 768)),
            (1408, (1408, 1408, 128), (1408, 128, 1408, 128)),
            (1408, (1408, 1408, 1408), (1408, 128, 1408, 128)),
        ]),
        ("vggt-student-1370-r2", 2, 12, 1370, 64, False, [
            (1536, (1536, 1536, 768), (1536, 768, 1536, 768)),  # new fallbk
            (1536, (1536, 1536, 384), (1536, 384, 1536, 384)),
            (1536, (1536, 1536, 512), (1536, 512, 1536, 512)),
        ]),
        ("student-1025-r2", 2, 12, 1025, 64, False, [
            (1152, (1152, 1152, 384), (1152, 384, 1152, 384)),  # winner r1
            (1152, (1152, 1152, 384), (1152, 384, 1152, 128)),
            (1152, (1152, 1152, 128), (1152, 384, 1152, 384)),
        ]),
        ("teacher-672", 4, 16, 672, 64, True, [
            (768, (768, 768, 768), None),                    # CURRENT
            (768, (768, 768, 384), None),
            (768, (384, 768, 384), None),
            (768, (768, 768, 256), None),
        ]),
        ("cost-673", 2, 12, 673, 64, False, [
            (768, (768, 768, 768), (768, 768, 768, 768)),    # CURRENT
            (768, (768, 768, 384), (768, 384, 768, 384)),
            (768, (768, 768, 256), (768, 256, 768, 256)),
        ]),
        ("vggt-frame-1374", 4, 16, 1374, 64, True, [
            (1536, (768, 768, 768), None),                   # CURRENT
            (1408, (1408, 1408, 128), None),
            (1408, (1408, 1408, 1408), None),
        ]),
        ("vggt-global-2748", 2, 16, 2748, 64, True, [
            (3072, (768, 768, 768), None),                   # CURRENT
            (3072, (1536, 1536, 768), None),                 # new fallback
            (2816, (2816, 2816, 256), None),
            (2816, (1408, 2816, 256), None),
            (2816, (1408, 1408, 128), None),
        ]),
        ("vggt-global-2748-r2", 2, 16, 2748, 64, True, [
            (2816, (1408, 1408, 1408), None),
            (2816, (1408, 2816, 1408), None),
            (3072, (1536, 1536, 1536), None),
        ]),
    ]
    only = os.environ.get("GD3D_PROBE_SHAPE")
    if only:
        shapes = [s for s in shapes if s[0] == only]

    for label, B, H, N, D, fwd_only, candidates in shapes:
        q = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B, H, N, D), jnp.bfloat16)
        mode = "fwd-only" if fwd_only else "fwd+bwd"
        print(f"== {label}: B={B} H={H} N={N} D={D} bf16, {L}-layer scan, "
              f"{mode}, per-layer times ==", flush=True)
        for pad_to, fwd_blocks, bwd_blocks in candidates:
            tag = f"pad{pad_to} f{fwd_blocks} b{bwd_blocks}"
            try:
                attn_fn = make_padded_flash(
                    pad_to, fwd_blocks, bwd_blocks or (128, 128, 128, 128))
                if fwd_only:
                    fn = jax.jit(functools.partial(scan_loss, attn_fn))
                else:
                    fn = jax.jit(functools.partial(grad_scalar, attn_fn))
                def force(o):
                    # axon's block_until_ready is a no-op; force a transfer
                    for leaf in jax.tree_util.tree_leaves(o):
                        np.asarray(leaf[(0,) * leaf.ndim])

                out = fn(q, k, v)
                force(out)
                ts = []
                for _ in range(iters):
                    t0 = time.perf_counter()
                    out = fn(q, k, v)
                    force(out)
                    ts.append(time.perf_counter() - t0)
                dt = float(np.median(ts)) / L
                # useful FLOPs at the REAL length; fwd+bwd ~3.5x fwd
                factor = 1.0 if fwd_only else 3.5
                flops_layer = factor * 4 * B * H * N * N * D
                mfu = flops_layer / dt / 197e12
                print(f"  {tag}: {dt * 1e3:.2f} ms/layer "
                      f"(~{mfu * 100:.0f}% useful-MFU)", flush=True)
            except Exception as e:
                msg = str(e).split("\n")[0][:140]
                print(f"  {tag}: FAILED {type(e).__name__}: {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
