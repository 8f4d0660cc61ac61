"""VGGT Aggregator: 24x alternating (frame, global) attention with
cross-frame cost-volume export.

Parity target: vggt/models/aggregator.py:24-349 — DINOv2 patchify, one
camera + 4 register tokens per frame (first-frame vs rest variants,
slice_expand_and_flatten :326-349), RoPE positions shifted +1 with zeros for
special tokens, frame attention over (B*S, P) and global attention over
(B, S*P); the fork returns cross-frame attention maps from the global blocks
at `attn_indices`, layer-meaned.

TPU notes: the S*P global-attention axis is the long-sequence dimension
(SURVEY.md §5); at S=2 it is replicated, the `model` mesh axis TP-shards the
qkv/MLP kernels instead (gd3d.parallel). The aggregator runs in bf16 under
the teacher precision policy (finetune_timm_vggt.py:359) with fp32 heads.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.dinov2 import DinoV2
from gd3d.models.vggt.layers import VggtBlock
from gd3d.ops.rope2d import grid_positions

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


class AlternatingPair(nn.Module):
    """One (frame-attention, global-attention) layer pair — the nn.scan body
    of the alternating-attention trunk (aggregator.py:249-323). The global
    block always exports its cross-frame map; layer selection happens on the
    stacked output."""

    cfg: VggtConfig
    B: int = 1
    S: int = 2
    sp_mesh: Optional[object] = None
    sp_axis: str = "data"
    sp_batch_axis: Optional[str] = None

    def _constrain(self, x, *spec):
        """Pin the batch-dim sharding at the frame<->global layout reshapes.

        Without these the partitioner back-propagates the ring-attention
        sequence sharding through the reshapes and, when it conflicts with
        the batch sharding, falls back to 'involuntary full
        rematerialization' (replicate + repartition) — a throughput cliff
        on real multi-chip meshes. Pinning both sides to batch-dim-sharded
        keeps the reshapes local; the only resharding left is the explicit
        slice/all-gather at the shard_map boundary over the (orthogonal)
        sp_axis. Reference axis: vggt/models/aggregator.py:249-323."""
        if self.sp_mesh is None:
            return x
        from jax.lax import with_sharding_constraint
        from jax.sharding import NamedSharding, PartitionSpec

        return with_sharding_constraint(
            x, NamedSharding(self.sp_mesh, PartitionSpec(*spec)))

    @nn.compact
    def __call__(self, carry, attn_weight, pos, gpos, temperature):
        """carry = (tokens, attn_accum); attn_weight is this layer's share
        of the layer-mean (1/len(attn_indices) for selected layers, else 0)
        — accumulating inside the scan keeps ONE (2B, Pp, Pp) map live
        instead of stacking all `depth` of them (~360 MB at 518^2/fp32)."""
        cfg = self.cfg
        C = cfg.embed_dim
        ba = self.sp_batch_axis
        tokens, attn_accum = carry
        BS, P, _ = tokens.shape
        tokens, _ = VggtBlock(
            C, cfg.num_heads, cfg.mlp_ratio, cfg.init_values,
            qk_norm=cfg.qk_norm, use_rope=True, rope_freq=cfg.rope_freq,
            eps=cfg.agg_layernorm_eps, name="frame",
        )(tokens, pos=pos)
        frame_inter = tokens.reshape(self.B, self.S, P, C)

        # the S*P global-attention axis is the long-sequence dimension:
        # with sp_mesh set it runs ring attention sharded over sp_axis
        tokens = self._constrain(tokens, ba, None, None)
        gtokens = self._constrain(
            tokens.reshape(self.B, self.S * P, C), ba, None, None)
        # the cross-frame attention export is a PAIR construct (frame1<->
        # frame2 score blocks, attention.py:51-85) — only valid at S == 2;
        # longer sequences run the same blocks without the export
        export = self.S == 2
        gtokens, amap = VggtBlock(
            C, cfg.num_heads, cfg.mlp_ratio, cfg.init_values,
            qk_norm=cfg.qk_norm, use_rope=True, rope_freq=cfg.rope_freq,
            eps=cfg.agg_layernorm_eps, sp_mesh=self.sp_mesh,
            sp_axis=self.sp_axis, sp_batch_axis=ba, name="global",
        )(gtokens, pos=gpos, return_attn=export, temperature=temperature)
        gtokens = self._constrain(gtokens, ba, None, None)
        tokens = self._constrain(gtokens.reshape(BS, P, C), ba, None, None)
        global_inter = gtokens.reshape(self.B, self.S, P, C)
        if export:
            attn_accum = attn_accum + attn_weight * amap.astype(
                attn_accum.dtype)
        return (tokens, attn_accum), (frame_inter, global_inter)


class Aggregator(nn.Module):
    cfg: VggtConfig
    # optional sequence parallelism for the global-attention token axis
    # (MeshConfig.sequence_parallel -> VggtTeacher(sp_mesh=...));
    # sp_batch_axis keeps the batch sharded over an orthogonal axis (DP x SP)
    sp_mesh: Optional[object] = None
    sp_axis: str = "data"
    sp_batch_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        temperature=1.0,
        attn_indices: Optional[Tuple[int, ...]] = None,
    ):
        """images (B, S, H, W, 3) in [0, 1]. Returns (tokens_list, attn_mean)
        where tokens_list has `depth` entries (B, S, P, 2C) and attn_mean is
        (2B, Pp, Pp) — head- and layer-meaned cross-frame attention (a
        two-frame construct: zeros when S != 2)."""
        cfg = self.cfg
        B, S, H, W, _ = images.shape
        C = cfg.embed_dim
        ps = cfg.patch_size
        gh, gw = H // ps, W // ps

        mean = jnp.asarray(_RESNET_MEAN, images.dtype)
        std = jnp.asarray(_RESNET_STD, images.dtype)
        x = (images - mean) / std
        x = x.reshape(B * S, H, W, 3)

        patch_tokens = DinoV2(cfg, name="patch_embed")(x)  # (B*S, P, C)
        P_patch = patch_tokens.shape[1]

        camera_token = self.param(
            "camera_token", nn.initializers.normal(1e-6), (1, 2, 1, C)
        )
        register_token = self.param(
            "register_token", nn.initializers.normal(1e-6),
            (1, 2, cfg.num_register_tokens, C),
        )

        def slice_expand_flatten(tok):
            # aggregator.py:326-349: slot 0 for frame 0, slot 1 for the rest
            first = jnp.broadcast_to(tok[:, 0:1], (B, 1) + tok.shape[2:])
            rest = jnp.broadcast_to(tok[:, 1:2], (B, S - 1) + tok.shape[2:])
            comb = jnp.concatenate([first, rest], axis=1)
            return comb.reshape((B * S,) + tok.shape[2:])

        tokens = jnp.concatenate(
            [
                slice_expand_flatten(camera_token).astype(patch_tokens.dtype),
                slice_expand_flatten(register_token).astype(patch_tokens.dtype),
                patch_tokens,
            ],
            axis=1,
        )  # (B*S, P, C)
        P = tokens.shape[1]
        psi = cfg.patch_start_idx

        # RoPE positions: +1 shift, zeros for special tokens (aggregator.py:236-239)
        pos_patch = grid_positions(gh, gw, B * S) + 1
        pos_special = jnp.zeros((B * S, psi, 2), pos_patch.dtype)
        pos = jnp.concatenate([pos_special, pos_patch], axis=1)  # (B*S, P, 2)

        if attn_indices is None:
            attn_indices = tuple(range(cfg.depth))

        gpos = pos.reshape(B, S * P, 2)
        # per-layer share of the layer-mean: 1/len(indices) for selected
        # layers, 0 otherwise — the mean accumulates INSIDE the scan carry
        # so only one (2B, Pp, Pp) map is ever live
        weights = jnp.zeros((cfg.depth,), jnp.float32)
        weights = weights.at[jnp.asarray(attn_indices, jnp.int32)].set(
            1.0 / len(attn_indices))
        attn_init = jnp.zeros((2 * B, P_patch, P_patch), jnp.float32)
        Scanned = nn.scan(
            AlternatingPair,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.depth,
            in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
        )
        (_, attn_mean), (frame_inter, global_inter) = Scanned(
            cfg, B=B, S=S, sp_mesh=self.sp_mesh, sp_axis=self.sp_axis,
            sp_batch_axis=self.sp_batch_axis, name="aa_pairs"
        )((tokens, attn_init), weights, pos, gpos, temperature)
        # (L, B, S, P, C) x2

        output_list: List[jnp.ndarray] = [
            jnp.concatenate([frame_inter[i], global_inter[i]], axis=-1)
            for i in range(cfg.depth)
        ]
        return output_list, attn_mean
