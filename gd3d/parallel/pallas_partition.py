"""custom_partitioning wrappers for the gd3d pallas kernels.

GSPMD/Shardy cannot auto-partition Mosaic (pallas) custom-calls — the AOT
v5e-8 compile of the flagship DP x TP step fails with "Mosaic kernels cannot
be automatically partitioned. Please wrap the call in a shard_map." (The
virtual CPU mesh never sees this: on CPU every kernel takes its XLA/einsum
fallback.) All gd3d kernels are embarrassingly parallel over their leading
batch dims — exactly the dims the flagship shards (batch over `data`, heads
over `model` via the Megatron qkv split) — so `batch_partition` wraps an
impl in jax.experimental.custom_partitioning with an Sdy sharding rule that
passes the leading dims through and marks every sequence/feature factor
need-replication. partition() re-emits the SAME pallas call on the per-shard
local shapes; Shardy inserts any reshards outside.
"""
from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def batch_partition(impl, rank_by_arg, out_ranks, rule, need_repl,
                    n_static):
    """custom_partitioning wrapper for a batch-parallel pallas impl.

    impl(*arrays, *statics); rank_by_arg[i] = how many leading dims of array
    i are shardable batch dims (2 for (B, H, ...) tensors, 1 for (B, ...)),
    out_ranks likewise per output. The mesh axes for those dims are read off
    operand 0's sharding; every other dim is forced replicated. `rule` is
    the einsum-style Sdy sharding rule, `need_repl` its non-batch factors.
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    n_arr = len(rank_by_arg)
    f = custom_partitioning(
        impl, static_argnums=tuple(range(n_arr, n_arr + n_static)))

    def _axes(arg_shapes):
        sh = getattr(arg_shapes[0], "sharding", None)
        spec = tuple(getattr(sh, "spec", ()) or ())
        nbh = max(max(rank_by_arg), max(out_ranks))
        return tuple(spec[i] if i < len(spec) else None
                     for i in range(nbh))

    def _shard(mesh, axes, ndim, nbh):
        spec = [None] * ndim
        for i in range(min(nbh, ndim)):
            spec[i] = axes[i]
        return NamedSharding(mesh, P(*spec))

    def infer(*args):
        *statics, mesh, arg_shapes, result_shape = args
        del statics
        axes = _axes(arg_shapes)
        leaves = jax.tree_util.tree_leaves(result_shape)
        outs = [_shard(mesh, axes, len(s.shape), nbh)
                for s, nbh in zip(leaves, out_ranks)]
        return outs[0] if len(leaves) == 1 else tuple(outs)

    def part(*args):
        *statics, mesh, arg_shapes, result_shape = args
        axes = _axes(arg_shapes)
        arg_sh = tuple(
            _shard(mesh, axes, len(s.shape), nbh)
            for s, nbh in zip(arg_shapes, rank_by_arg))
        out_sh = infer(*args)

        def lower(*arrays):
            return impl(*arrays, *statics)

        return mesh, lower, out_sh, arg_sh

    f.def_partition(partition=part, infer_sharding_from_operands=infer,
                    sharding_rule=rule,
                    need_replication_factors=need_repl)
    return f
