"""FSDP / ZeRO-3-style parameter sharding for the frozen teachers.

The reference replicates every model on every DDP rank
(/root/reference/src/main.py:147-161) — fine for ViT-L, wasteful for the
1B-param VGGT teacher whose bf16 weights cost ~2 GB of HBM per chip. Here
each large parameter leaf is sharded over the DATA axis (the same axis DP
batches ride); XLA's SPMD partitioner inserts the per-layer all-gathers
over ICI when the weights meet the computation, exactly the ZeRO-3
execution model — weights live sharded, materialize layer-by-layer,
activations stay data-parallel. On a v5e-8 DP mesh this cuts the teacher's
resident HBM 8x, buying batch/activation headroom.

Composes with tensor parallelism (`gd3d/parallel/sharding.py`): a leaf the
TP rules shard on `model` gets its FSDP dim chosen among the REMAINING
dims, giving standard 2D (fsdp x tp) weight layouts.

Frozen-teacher params never receive gradients, so there is no
reduce-scatter half here — this is the inference-side subset of FSDP,
which is all the distillation pipeline needs (the trainable adapter tree
is ~1M params and stays replicated).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gd3d.core.mesh import DATA_AXIS

# leaves smaller than this stay replicated: the all-gather latency on a
# tiny LayerNorm vector costs more than the bytes it saves
MIN_FSDP_SIZE = 2 ** 16


def fsdp_spec(leaf, n_data: int, tp_spec: Optional[P] = None,
              min_size: int = MIN_FSDP_SIZE) -> P:
    """PartitionSpec sharding `leaf`'s largest eligible dim over DATA_AXIS.

    Eligible = divisible by `n_data` and not already taken by `tp_spec`.
    Prefers the largest dim (fewest padding hazards, best bytes-per-
    collective); returns `tp_spec`/replicated when nothing qualifies.
    """
    base = list(tp_spec) if tp_spec is not None else []
    ndim = getattr(leaf, "ndim", 0)
    base = base + [None] * (ndim - len(base))
    if ndim == 0 or leaf.size < min_size:
        return P(*base) if any(base) else P()
    order = sorted(range(ndim), key=lambda d: -leaf.shape[d])
    for d in order:
        if base[d] is None and leaf.shape[d] % n_data == 0 \
                and leaf.shape[d] >= n_data:
            base[d] = DATA_AXIS
            return P(*base)
    return P(*base) if any(base) else P()


def apply_fsdp_sharding(params, mesh: Mesh, with_tp: bool = False,
                        min_size: int = MIN_FSDP_SIZE):
    """device_put a (frozen) param tree with FSDP specs over `mesh`.

    with_tp=True composes the Megatron TP rules first (2D fsdp x tp);
    ineligible leaves stay replicated (or TP-only).
    """
    from gd3d.parallel.sharding import vit_tp_rules
    from gd3d.core.mesh import MODEL_AXIS

    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape[MODEL_AXIS] if MODEL_AXIS in mesh.shape else 1
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for path, leaf in flat:
        if leaf is None:
            leaves.append(None)
            continue
        tp = None
        if with_tp and n_model > 1:
            tp = vit_tp_rules(path, leaf)
            for dim, s in enumerate(tp):
                if s == MODEL_AXIS and leaf.shape[dim] % n_model != 0:
                    tp = P()
                    break
        spec = fsdp_spec(leaf, n_data, tp_spec=tp, min_size=min_size)
        leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def sharded_fraction(params, mesh: Mesh) -> Tuple[int, int]:
    """(bytes sharded over data axis, total bytes) — a diagnostic for logs."""
    total = sharded = 0
    for leaf in jax.tree_util.tree_leaves(params):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        shard = getattr(leaf, "sharding", None)
        spec = getattr(shard, "spec", None)
        if spec and any(s == DATA_AXIS
                        for s in jax.tree_util.tree_leaves(list(spec))):
            sharded += nbytes
    return sharded, total
