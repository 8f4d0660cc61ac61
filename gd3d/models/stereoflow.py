"""CroCo-Stereo / CroCo-Flow: binocular downstream model with a DPT head.

Parity targets (the croco v2 downstream suite the reference vendors):
  - dust3r/croco/models/croco_downstream.py:69-122 (CroCoDownstreamBinocular:
    pair-batched encoder, all-blocks decoder, enc+dec hook list)
  - dust3r/croco/models/head_downstream.py:20-60 (PixelwiseTaskWithDPT:
    auto hooks [enc+dec-1-i*step], step={8:3,12:4,24:8}[dec_depth],
    layer_dims [96,192,384,768], last_dim 32, generic DPTOutputAdapter)
  - dust3r/croco/stereoflow/test.py:52-79 (num_channels = task channels
    + 1 confidence channel when the criterion carries confidence)

The reference's own CroCoDownstreamBinocular.forward is dead code in-tree
(its 2-tuple decoder unpack predates the fork's 3-tuple DecoderBlock return,
dust3r/croco/models/blocks.py:189-195); this module implements the intended
semantics, which the reference-direct test drives manually.

TPU-first: the pair is encoded as one batch of 2B, decoder layers run as one
weight-stacked nn.scan collecting per-layer outputs, NHWC throughout.
Input normalization is ImageNet mean/std (stereoflow/datasets_stereo.py:41-46)
— NOT the dust3r +/-0.5.
"""
from __future__ import annotations

import dataclasses
from typing import Mapping, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gd3d.models.croco import (
    CrocoConfig,
    CrocoDecoderBlock,
    CrocoEncoder,
)
from gd3d.models.dpt import DustDPT

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class StereoFlowConfig:
    """Defaults: the released CroCo v2 ViT-L/16 enc + Base dec trunk
    (CroCo_V2_ViTLarge_BaseDecoder) the stereo/flow checkpoints fine-tune."""

    croco: CrocoConfig = dataclasses.field(default_factory=CrocoConfig)
    task: str = "stereo"            # 'stereo' (1ch disparity) | 'flow' (2ch)
    with_conf: bool = True          # criterion.with_conf -> +1 output channel
    hooks: Optional[Tuple[int, int, int, int]] = None  # None = auto formula
    dpt_layer_dims: Tuple[int, int, int, int] = (96, 192, 384, 768)
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 32          # dpt_block.py:319-323 (last_dim default)

    @property
    def task_channels(self) -> int:
        return {"stereo": 1, "flow": 2}[self.task]

    @property
    def num_out_channels(self) -> int:
        return self.task_channels + int(self.with_conf)

    @property
    def resolved_hooks(self) -> Tuple[int, int, int, int]:
        """head_downstream.py:40-46: 4 hooks over the concatenated
        [enc_blocks..., dec_blocks...] output list."""
        if self.hooks is not None:
            return self.hooks
        c = self.croco
        step = {8: 3, 12: 4, 24: 8}[c.dec_depth]
        return tuple(
            c.dec_depth + c.enc_depth - 1 - i * step for i in range(3, -1, -1)
        )


def normalize_imagenet(img_01: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [0, 1] -> ImageNet-normalized (datasets_stereo.py:44)."""
    mean = jnp.asarray(IMAGENET_MEAN, img_01.dtype)
    std = jnp.asarray(IMAGENET_STD, img_01.dtype)
    return (img_01 - mean) / std


class _DecBlockScanned(nn.Module):
    """One cross-decoder layer for the scan: carry = evolving img1 stream,
    the img2 stream stays the encoder projection (croco.py:173-208: the
    original DecoderBlock passes y through unchanged)."""

    cfg: CrocoConfig

    @nn.compact
    def __call__(self, x, y, xpos, ypos):
        nx, _ = CrocoDecoderBlock(self.cfg, name="blk")(
            x, y, xpos, ypos, return_attn=False
        )
        return nx, nx


class StereoFlow(nn.Module):
    """__call__(img1, img2) with (B, H, W, 3) ImageNet-normalized inputs ->
    (pred (B, H, W, task_channels), conf (B, H, W) or None)."""

    cfg: StereoFlowConfig

    def setup(self):
        c = self.cfg.croco
        self.encoder = CrocoEncoder(c, collect_all=True, name="encoder")
        self.decoder_embed = nn.Dense(
            c.dec_embed_dim, use_bias=True, name="decoder_embed"
        )
        Scanned = nn.scan(
            _DecBlockScanned,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.dec_depth,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        self.dec_blocks = Scanned(c, name="dec_blocks")
        self.dec_norm = nn.LayerNorm(epsilon=c.layernorm_eps, name="dec_norm")
        self.head = DustDPT(
            layer_dims=self.cfg.dpt_layer_dims,
            feature_dim=self.cfg.dpt_feature_dim,
            last_dim=self.cfg.dpt_last_dim,
            out_channels=self.cfg.num_out_channels,
            name="head",
        )

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray):
        cfg = self.cfg
        c = cfg.croco
        B, H, W, _ = img1.shape
        gh, gw = H // c.patch_size, W // c.patch_size

        # encode_image_pairs (croco_downstream.py:94-107): one 2B batch
        fin, pos, allx = self.encoder(jnp.concatenate([img1, img2], axis=0))
        f1, f2 = fin[:B], fin[B:]
        p1, p2 = pos[:B], pos[B:]
        # enc all-blocks list, last entry normed (croco.py:160-165)
        enc_outs = [allx[i, :B] for i in range(c.enc_depth - 1)] + [f1]

        g1 = self.decoder_embed(f1)
        g2 = self.decoder_embed(f2)
        _, ys = self.dec_blocks(g1, g2, p1, p2)
        dec_outs = [ys[i] for i in range(c.dec_depth - 1)]
        dec_outs.append(self.dec_norm(ys[-1]))

        all_tokens = enc_outs + dec_outs
        hooked = [all_tokens[h] for h in cfg.resolved_hooks]
        out = self.head(hooked, (gh, gw))  # (B, H, W, num_out_channels)

        if cfg.with_conf:
            return out[..., : cfg.task_channels], out[..., cfg.task_channels]
        return out, None


# ---------------------------------------------------------------------------
# torch -> flax converter for CroCo-Stereo / CroCo-Flow checkpoints
# ---------------------------------------------------------------------------

def convert_stereoflow(
    state: Mapping, cfg: StereoFlowConfig = StereoFlowConfig()
) -> dict:
    """Convert a CroCoDownstreamBinocular state_dict (the released
    crocostereo.pth / crocoflow.pth layout, or croco_downstream.py applied
    to a fresh torch model) to the gd3d param tree."""
    from gd3d.teachers.convert import _conv, _layernorm, _linear, _stack_trees
    from gd3d.teachers.mast3r import _decoder_block, _dpt_tree, _enc_block

    c = cfg.croco
    params: dict = {
        "encoder": {
            "patch_embed": _conv(state, "patch_embed.proj"),
            "enc_norm": _layernorm(state, "enc_norm"),
            "enc_blocks": _stack_trees(
                [_enc_block(state, f"enc_blocks.{i}") for i in range(c.enc_depth)]
            ),
        },
        "decoder_embed": _linear(state, "decoder_embed"),
        "dec_norm": _layernorm(state, "dec_norm"),
        "dec_blocks": {
            "blk": _stack_trees(
                [
                    _decoder_block(state, f"dec_blocks.{i}")
                    for i in range(c.dec_depth)
                ]
            )
        },
        "head": _dpt_tree(state, "head.dpt"),
    }
    return params
