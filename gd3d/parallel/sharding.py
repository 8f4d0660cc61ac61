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

# column-parallel: output dim sharded, no collective needed on the way in.
# projq/projk/projv are croco cross-attention's separate q/k/v projections
# (gd3d/models/croco.py); lora_b_ pairs with the replicated lora_a_.
_COL = ("qkv", "fc1", "lora_b_", "projq", "projk", "projv")
# row-parallel: input (contracted) dim sharded; XLA all-reduces the output.
_ROW = ("proj/", "fc2")


def vit_tp_rules(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one param leaf of a ViT-family tree.

    Stacked (nn.scan weight-stacked) layers are detected by ndim, not by
    container name: a Dense kernel is (in, out) at ndim 2 and (L, in, out)
    at ndim 3; biases (out,) / (L, out). Conv kernels (ndim 4+) and
    LayerNorm/LayerScale params never match and stay replicated.
    """
    names = [str(getattr(k, "key", k)) for k in path]
    joined = "/".join(names)
    if leaf is None:
        return P()
    ndim = getattr(leaf, "ndim", 0)
    if "kernel" in joined and ndim in (2, 3):
        lead = (None,) if ndim == 3 else ()
        if any(m in joined for m in _COL):
            return P(*lead, None, MODEL_AXIS)  # column parallel
        if any(m in joined for m in _ROW):
            return P(*lead, MODEL_AXIS, None)  # row parallel
    if "bias" in joined and ndim in (1, 2):
        lead = (None,) if ndim == 2 else ()
        if any(m in joined for m in _COL):
            return P(*lead, MODEL_AXIS)
    return P()


def tp_sharding_tree(params, mesh: Mesh):
    """NamedSharding tree for a param tree under the TP rules (replicated
    elsewhere). Works on concrete arrays OR ShapeDtypeStructs — the
    deviceless AOT path (dryrun_multichip_aot) builds its in_shardings
    from eval_shape trees through this.

    Leaves whose to-be-sharded dim is not divisible by the model-axis size
    fall back to replicated — tiny test configs and odd head dims stay
    correct instead of erroring.
    """
    n_model = mesh.shape[MODEL_AXIS]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    shardings = []
    for path, leaf in flat:
        if leaf is None:
            shardings.append(None)
            continue
        spec = vit_tp_rules(path, leaf)
        for dim, s in enumerate(spec):
            if s == MODEL_AXIS and leaf.shape[dim] % n_model != 0:
                spec = P()
                break
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def apply_tp_sharding(params, mesh: Mesh):
    """device_put a param tree with TP rules over `mesh` (replicate the
    rest); see tp_sharding_tree for the divisibility fallback."""
    return jax.tree_util.tree_map(
        jax.device_put, params, tp_sharding_tree(params, mesh))
