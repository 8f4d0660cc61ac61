"""Sequence/context parallelism for the long-token-axis attention.

SURVEY.md §2.4/§5: the reference's only long-sequence pressure point is
VGGT's global attention over S*P tokens (vggt/models/aggregator.py:298-323),
which it never scales beyond one GPU. This module provides the TPU-native
CP story for S > 2: shard the query/sequence axis over a mesh axis and run
attention with ring-passed KV blocks (flash-style online softmax per block),
so each device holds 1/n of the tokens and KV traffic rides ICI neighbor
hops instead of a full all-gather.

Also includes the simpler all-gather-KV variant for small KV (the S=2
regime), and a CPU-mesh test exercises both against single-device attention.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gd3d.core.mesh import DATA_AXIS


def _block_attention(q, k, v, scale):
    """(B, Nq, H, D) x (B, Nk, H, D) -> unnormalized (out, lse) pair."""
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k).astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    num = jnp.einsum("bhnm,bmhd->bnhd", e, v.astype(jnp.float32))
    den = jnp.sum(e, axis=-1)  # (B, H, Nq)
    return num, den, m[..., 0]  # (B,Nq,H,D), (B,H,Nq), (B,H,Nq)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    scale: Optional[float] = None,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-sharded attention with ring-passed KV.

    q, k, v: (B, N, H, D) GLOBAL arrays; N must divide by the mesh axis size.
    Each device keeps its N/n query shard; K/V shards rotate around the ring
    with jax.lax.ppermute while an online-softmax accumulator merges blocks —
    the shard_map/XLA-collective analogue of ring attention.

    batch_axis: optionally shard B over a second mesh axis so SP composes
    with data parallelism (the DP x SP regime: batch stays on `batch_axis`,
    the ring rides `axis` — orthogonal axes, so the surrounding layout
    transitions stay local instead of cross-axis reshuffles).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n = mesh.shape[axis]
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis] != 0:
        batch_axis = None  # e.g. the B=1 init dummy: replicate the batch

    def local(qs, ks, vs):
        # qs/ks/vs: per-device shards (B, N/n, H, D)
        def merge(acc, blk):
            num_a, den_a, m_a = acc
            num_b, den_b, m_b = blk
            m_new = jnp.maximum(m_a, m_b)
            ca = jnp.exp(m_a - m_new)
            cb = jnp.exp(m_b - m_new)
            num = num_a * ca.transpose(0, 2, 1)[..., None] + \
                num_b * cb.transpose(0, 2, 1)[..., None]
            den = den_a * ca + den_b * cb
            return num, den, m_new

        acc = _block_attention(qs, ks, vs, scale)
        kv = (ks, vs)
        for step in range(1, n):
            kv = jax.tree_util.tree_map(
                lambda x: jax.lax.ppermute(
                    x, axis,
                    [(i, (i + 1) % n) for i in range(n)],
                ),
                kv,
            )
            acc = merge(acc, _block_attention(qs, kv[0], kv[1], scale))
        num, den, _ = acc
        return (num / den.transpose(0, 2, 1)[..., None]).astype(q.dtype)

    spec = P(batch_axis, axis, None, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)


def allgather_kv_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    scale: Optional[float] = None,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Query-sharded attention with all-gathered KV (small-KV regime)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if batch_axis is not None and q.shape[0] % mesh.shape[batch_axis] != 0:
        batch_axis = None  # e.g. the B=1 init dummy: replicate the batch

    def local(qs, ks, vs):
        kg = jax.lax.all_gather(ks, axis, axis=1, tiled=True)
        vg = jax.lax.all_gather(vs, axis, axis=1, tiled=True)
        num, den, _ = _block_attention(qs, kg, vg, scale)
        return (num / den.transpose(0, 2, 1)[..., None]).astype(qs.dtype)

    spec = P(batch_axis, axis, None, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)
