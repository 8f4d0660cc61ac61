"""Tensor-parallel sharding rules for the transformer stacks.

Megatron-style TP over the `model` mesh axis: qkv/fc1 kernels column-sharded,
proj/fc2 kernels row-sharded, matching biases sharded on their output dim.
XLA inserts the (all-reduce) collectives over ICI when the annotated params
meet replicated activations — no NCCL-style hand-written comms (SURVEY.md
§2.4: the reference has no TP; we add it for the 1B-param VGGT teacher and
for headroom on the student).
"""
from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gd3d.core.mesh import MODEL_AXIS


def vit_tp_rules(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one param leaf of a ViT-family tree."""
    names = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(names)
    if leaf is None:
        return P()
    ndim = getattr(leaf, "ndim", 0)
    # nn.scan weight stacking adds a leading layer axis (kernels become
    # (L, in, out), biases (L, out)); the layer axis stays unsharded.
    stacked = any(m in joined for m in ("blocks_plain", "blocks_adapt",
                                        "blocks/", "scan"))
    kdim = 3 if stacked else 2
    bdim = 2 if stacked else 1
    lead = (None,) if stacked else ()
    if "kernel" in joined and ndim == kdim:
        if any(m in joined for m in ("qkv", "fc1", "lora_b_")):
            return P(*lead, None, MODEL_AXIS)  # column parallel
        if any(m in joined for m in ("proj/", "fc2")) or joined.endswith("proj/kernel"):
            return P(*lead, MODEL_AXIS, None)  # row parallel
    if "bias" in joined and ndim == bdim:
        if any(m in joined for m in ("qkv", "fc1")):
            return P(*lead, MODEL_AXIS)
    return P()


def apply_tp_sharding(params, mesh: Mesh):
    """device_put a param tree with TP rules over `mesh` (replicate the rest)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, leaf in flat:
        if leaf is None:
            leaves.append(None)
            continue
        spec = vit_tp_rules(path, leaf)
        leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
