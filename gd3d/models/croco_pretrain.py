"""CroCo PRETRAINING net: masked cross-view completion.

The stage that produces the encoder/decoder the DUSt3R/MASt3R trunk starts
from — the last piece of the vendored croco tree (SURVEY row 31) gd3d did
not already cover. Parity targets:

  - masked forward: dust3r/croco/models/croco.py:137-256 (_encode_image
    with do_mask, _decoder's mask-token canvas, linear pixel head,
    patchify target)
  - masking: dust3r/croco/models/masking.py:12-25 (RandomMask: iid noise,
    argsort < num_mask — a uniform subset of EXACTLY num_mask positions)
  - criterion: dust3r/croco/models/criterion.py:14-37 (MaskedMSE with the
    optional per-patch pixel normalization)

TPU-first design: ``int(mask_ratio * N)`` is a static count, so the
visible-token gather, the Nvis-token encoder, and the mask-token canvas
scatter are all fixed-shape — the whole pretraining step jits with no
dynamic shapes. The visible subset is recovered in original patch order
with one stable argsort of the mask (matching torch's ``x[~masks]``
row-major semantics), and the canvas scatter is a single batched
``.at[].set``. Blocks/params are shared with the distillation-era CroCo
stack (gd3d/models/croco.py), so a pretrained tree converts into a DUSt3R
trunk via :func:`croco_to_dust3r` exactly the way the reference loads
CroCo checkpoints into AsymmetricCroCo3DStereo (dust3r/dust3r/model.py:
169-176 duplicates dec_blocks into dec_blocks2 when absent).

Scope: RoPE positional mode only (``pos_embed='RoPE100'``) — every DUSt3R/
MASt3R trunk is a RoPE100 CroCo v2; the original cosine-embed CroCo v1
variant has no downstream consumer in this pipeline.

Note: the reference's own ``CroCoNet.forward`` is DEAD CODE in-tree — the
fork makes DecoderBlock return ``(x, y, attn_map)`` (blocks.py:189-195)
while the pretraining ``_decoder`` still unpacks two values (croco.py:206)
and raises. The reference-direct test (test_croco_pretrain.py) therefore
drives the reference's components manually with the fork-compatible
unpack; this module locks parity against those semantics.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from gd3d.models.croco import (
    CrocoConfig,
    CrocoDecoderBlock,
    CrocoEncoderBlock,
)
from gd3d.ops.rope2d import grid_positions


def random_mask(rng: jax.Array, batch: int, num_patches: int,
                mask_ratio: float) -> jnp.ndarray:
    """RandomMask (masking.py:12-25): iid noise, ``argsort(noise) <
    num_mask``. Exactly ``int(mask_ratio * num_patches)`` True per row."""
    num_mask = int(mask_ratio * num_patches)
    noise = jax.random.uniform(rng, (batch, num_patches))
    return jnp.argsort(noise, axis=1) < num_mask


def masked_mse(pred: jnp.ndarray, mask: jnp.ndarray, target: jnp.ndarray,
               norm_pix_loss: bool = False,
               masked: bool = True) -> jnp.ndarray:
    """MaskedMSE (criterion.py:14-37). pred/target (B, N, p*p*3),
    mask (B, N) bool — loss over masked patches only (the default)."""
    if norm_pix_loss:
        mean = target.mean(axis=-1, keepdims=True)
        var = target.var(axis=-1, keepdims=True)
        target = (target - mean) / (var + 1.0e-6) ** 0.5
    loss = ((pred - target) ** 2).mean(axis=-1)  # (B, N)
    if masked:
        m = mask.astype(loss.dtype)
        return (loss * m).sum() / m.sum()
    return loss.mean()


class _DecoderStack(nn.Module):
    """Single-direction decoder layer (croco.py:173-210: img1 canvas
    attends to img2 memory; the memory side is NOT updated), scan-able."""

    cfg: CrocoConfig

    @nn.compact
    def __call__(self, x, y, xpos, ypos):
        x, _ = CrocoDecoderBlock(self.cfg, name="blk")(
            x, y, xpos, ypos, False
        )
        return x, None


class CrocoPretrain(nn.Module):
    """CroCoNet in pretraining mode (croco.py:240-256).

    ``__call__(img1, img2, mask1)`` -> ``(pred, target)`` with img* NHWC in
    [-1, 1] and mask1 (B, N) bool carrying exactly ``int(mask_ratio * N)``
    True entries per row (use :func:`random_mask`). ``pred``/``target``
    are (B, N, patch_size**2 * 3); feed them with mask1 to
    :func:`masked_mse`.
    """

    cfg: CrocoConfig
    mask_ratio: float = 0.9

    @nn.compact
    def __call__(self, img1, img2, mask1):
        cfg = self.cfg
        ps = cfg.patch_size
        B, H, W, _ = img1.shape
        gh, gw = H // ps, W // ps
        N = gh * gw
        n_vis = N - int(self.mask_ratio * N)

        patch_embed = nn.Conv(
            cfg.enc_embed_dim, (ps, ps), strides=(ps, ps), padding="VALID",
            name="patch_embed",
        )
        x1 = patch_embed(img1).reshape(B, N, cfg.enc_embed_dim)
        x2 = patch_embed(img2).reshape(B, N, cfg.enc_embed_dim)
        pos = grid_positions(gh, gw, B)

        # visible tokens in original patch order: stable-sort the mask so
        # the False (visible) entries come first, ascending — torch's
        # x[~masks].view(B, -1, C) ordering (croco.py:152-154)
        order = jnp.argsort(mask1.astype(jnp.int32), axis=1, stable=True)
        vis_idx = order[:, :n_vis]
        bidx = jnp.arange(B)[:, None]
        x1v = x1[bidx, vis_idx]
        pos1v = pos[bidx, vis_idx]

        Enc = nn.scan(
            CrocoEncoderBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.enc_depth,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        enc_blocks = Enc(cfg, scanned=True, name="enc_blocks")
        enc_norm = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="enc_norm")
        f1, _ = enc_blocks(x1v, pos1v)   # masked first view (Nvis tokens)
        f2, _ = enc_blocks(x2, pos)      # full second view (shared weights)
        f1, f2 = enc_norm(f1), enc_norm(f2)

        dec_embed = nn.Dense(cfg.dec_embed_dim, name="decoder_embed")
        v1 = dec_embed(f1)
        g2 = dec_embed(f2)
        mask_token = self.param(
            "mask_token", nn.initializers.normal(stddev=0.02),
            (1, 1, cfg.dec_embed_dim),
        )
        canvas = jnp.broadcast_to(
            mask_token.astype(v1.dtype), (B, N, cfg.dec_embed_dim)
        )
        canvas = canvas.at[bidx, vis_idx].set(v1)  # croco.py:186-188

        Dec = nn.scan(
            _DecoderStack,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.dec_depth,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        out, _ = Dec(cfg, name="dec_blocks")(canvas, g2, pos, pos)
        out = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="dec_norm")(out)
        pred = nn.Dense(ps * ps * 3, name="prediction_head")(out)

        # patchify target (croco.py:212-225): per-patch (p, q, c) raster
        target = img1.reshape(B, gh, ps, gw, ps, 3)
        target = target.transpose(0, 1, 3, 2, 4, 5).reshape(B, N, ps * ps * 3)
        return pred, target


def convert_croco_pretrain(state, cfg: CrocoConfig) -> dict:
    """torch CroCoNet state_dict -> CrocoPretrain param tree (nn.scan
    weight-stacked blocks)."""
    import numpy as np

    from gd3d.teachers.convert import _conv, _layernorm, _linear, _stack_trees
    from gd3d.teachers.mast3r import _decoder_block, _enc_block

    return {
        "patch_embed": _conv(state, "patch_embed.proj"),
        "enc_blocks": _stack_trees(
            [_enc_block(state, f"enc_blocks.{i}")
             for i in range(cfg.enc_depth)]
        ),
        "enc_norm": _layernorm(state, "enc_norm"),
        "decoder_embed": _linear(state, "decoder_embed"),
        "mask_token": np.asarray(state["mask_token"]),
        "dec_blocks": {
            "blk": _stack_trees(
                [_decoder_block(state, f"dec_blocks.{i}")
                 for i in range(cfg.dec_depth)]
            )
        },
        "dec_norm": _layernorm(state, "dec_norm"),
        "prediction_head": _linear(state, "prediction_head"),
    }


def croco_to_dust3r(pretrain_params: dict) -> dict:
    """Map a CrocoPretrain tree onto the Mast3r/DUSt3R trunk layout —
    the reference's CroCo-checkpoint load path (dust3r/dust3r/model.py:
    169-176: dec_blocks2 is duplicated from dec_blocks when absent).
    Heads (DPT/MLP) are not part of the pretraining net and must be
    freshly initialized by the caller."""
    p = pretrain_params
    return {
        "encoder": {
            "patch_embed": p["patch_embed"],
            "enc_blocks": p["enc_blocks"],
            "enc_norm": p["enc_norm"],
        },
        "decoder_embed": p["decoder_embed"],
        "dec_pairs": {
            "blk1": jax.tree_util.tree_map(lambda x: x,
                                           p["dec_blocks"]["blk"]),
            "blk2": jax.tree_util.tree_map(lambda x: x,
                                           p["dec_blocks"]["blk"]),
        },
        "dec_norm": p["dec_norm"],
    }
