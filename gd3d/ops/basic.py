"""Small numeric primitives shared across losses and eval.

Reference: /root/reference/utils/functions.py:24-33.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def temp_sigmoid(x: jnp.ndarray, temp: float = 1.0) -> jnp.ndarray:
    """Temperature-controlled sigmoid with +/-50 exponent clamp.

    Matches utils/functions.py:24-33: y = 1/(1+exp(clamp(-x/temp, -50, 50))).
    """
    exponent = jnp.clip(-x / temp, -50.0, 50.0)
    return 1.0 / (1.0 + jnp.exp(exponent))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize(p=2) semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def kth_smallest(x: jnp.ndarray, k) -> jnp.ndarray:
    """Exact jnp.sort(x.reshape(-1))[k] without the sort.

    A full TPU sort of the flagship's 336x512 confidence maps costs
    ~2 ms each (device-trace category "sort", round 5) when only ONE
    order statistic is consumed (the percentile threshold at
    finetune_timm_mast3r.py:441-451). This computes it by binary search
    over the order-preserving integer image of the floats: 32 masked
    count-reductions (~700 KB each) instead of an O(n log^2 n) bitonic
    sort. Exact for finite inputs including ties and mixed signs (the
    result is the smallest value v with count(x <= v) >= k+1, which IS
    sorted[k]). k may be a traced integer. Non-differentiable (the
    consumer thresholds against it; matches the reference's no-grad
    teacher conf use).
    """
    flat = lax.stop_gradient(x.reshape(-1))
    bits = lax.bitcast_convert_type(flat.astype(jnp.float32), jnp.uint32)
    # order-preserving map to uint32: flip sign bit for positives,
    # flip ALL bits for negatives
    key = jnp.where(
        (bits >> 31) == 0,
        bits | jnp.uint32(0x80000000),
        ~bits,
    )
    kk = jnp.asarray(k, jnp.uint32)

    def body(_, lohi):
        lo, hi = lohi
        mid = lo + (hi - lo) // jnp.uint32(2)
        cnt = jnp.sum((key <= mid).astype(jnp.uint32))
        take_lo = cnt >= kk + jnp.uint32(1)
        return (jnp.where(take_lo, lo, mid + jnp.uint32(1)),
                jnp.where(take_lo, mid, hi))

    lo, _ = lax.fori_loop(
        0, 32, body,
        (jnp.uint32(0), jnp.uint32(0xFFFFFFFF)))
    out_bits = jnp.where(
        (lo >> 31) != 0,
        lo & jnp.uint32(0x7FFFFFFF),
        ~lo,
    )
    return lax.bitcast_convert_type(out_bits, jnp.float32).astype(x.dtype)
