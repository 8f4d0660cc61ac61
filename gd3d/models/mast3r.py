"""AsymmetricMASt3R: siamese CroCo encoder + dual cross-decoders + heads.

Parity targets:
  - dust3r/dust3r/model.py:119-367 (AsymmetricCroCo3DStereo incl. the fork's
    cross-attention map collection :297-322 and reciprocity/temperature
    export :346-366)
  - mast3r/model.py:40-68 (AsymmetricMASt3R) and mast3r/catmlp_dpt_head.py
    (Cat_MLP_LocalFeatures_DPT_Pts3d :42-96, postprocess :25-39)
  - symmetrized-pair semantics of dust3r/dust3r/inference.py:26-29 +
    image_pairs.py:11-68: for a training pair the batch holds BOTH
    directions, element 0 = (view1=img2, view2=img1), element 1 =
    (view1=img1, view2=img2) — exactly the layout
    src/finetune_timm_mast3r.py:365-375 indexes with [0]/[1].

The TPU design runs the shared encoder once over both images and the two
decoder directions as one batch of 2 (the reference reaches the same state
via DataLoader collation). Landscape orientation (W >= H) is assumed — all
pipeline datasets satisfy it — making transpose_to_landscape the identity
(dust3r/dust3r/utils/misc.py:54).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gd3d.models.croco import CrocoConfig, CrocoDecoderPair, CrocoEncoder
from gd3d.models.dpt import DustDPT
from gd3d.ops.basic import l2_normalize


@dataclasses.dataclass(frozen=True)
class Mast3rConfig:
    croco: CrocoConfig = dataclasses.field(default_factory=CrocoConfig)
    local_feat_dim: int = 24       # output_mode 'pts3d+desc24'
    two_confs: bool = True
    conf_vmin: float = 1.0         # conf_mode ('exp', 1, inf)
    desc_conf_vmin: float = 0.0    # desc_conf_mode ('exp', 0, inf)
    dpt_feature_dim: int = 256
    dpt_last_dim: int = 128

    @property
    def head_hooks(self) -> Tuple[int, int, int, int]:
        l2 = self.croco.dec_depth
        return (0, l2 * 2 // 4, l2 * 3 // 4, l2)


def pixel_shuffle_nhwc(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """torch F.pixel_shuffle semantics on NHWC: channel d*r*r + i*r + j ->
    spatial (h*r+i, w*r+j) channel d."""
    B, h, w, C = x.shape
    d = C // (r * r)
    x = x.reshape(B, h, w, d, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, h * r, w * r, d)


class Mast3rHead(nn.Module):
    """catmlp+dpt head: DPT for pts3d+conf, MLP pixel-shuffle local feats."""

    cfg: Mast3rConfig

    @nn.compact
    def __call__(self, hooked_tokens, enc_out, dec_out, grid_hw):
        cfg = self.cfg
        ps = cfg.croco.patch_size
        gh, gw = grid_hw

        dpt_out = DustDPT(
            feature_dim=cfg.dpt_feature_dim,
            last_dim=cfg.dpt_last_dim,
            out_channels=4,
            name="dpt",
        )(hooked_tokens, grid_hw)  # (B, H, W, 4)

        cat = jnp.concatenate([enc_out, dec_out], axis=-1)  # (B, N, 1792)
        idim = cat.shape[-1]
        lf = nn.Dense(int(4.0 * idim), name="lf_fc1")(cat)
        lf = nn.gelu(lf, approximate=False)
        nch = (cfg.local_feat_dim + int(cfg.two_confs)) * ps * ps
        lf = nn.Dense(nch, name="lf_fc2")(lf)  # (B, N, nch)
        lf = lf.reshape(lf.shape[0], gh, gw, nch)
        lf = pixel_shuffle_nhwc(lf, ps)  # (B, H, W, 25)

        out = jnp.concatenate([dpt_out, lf], axis=-1)  # (B, H, W, 29)

        # postprocess (catmlp_dpt_head.py:25-39, dust3r/heads/postprocess.py)
        xyz = out[..., 0:3]
        d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
        pts3d = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
        conf = cfg.conf_vmin + jnp.exp(out[..., 3])
        desc = l2_normalize(out[..., 4 : 4 + cfg.local_feat_dim], axis=-1, eps=0.0)
        if cfg.two_confs:
            desc_conf = cfg.desc_conf_vmin + jnp.exp(out[..., 4 + cfg.local_feat_dim])
        else:
            desc_conf = conf
        return {"pts3d": pts3d, "conf": conf, "desc": desc, "desc_conf": desc_conf}


class Mast3r(nn.Module):
    """Full two-view symmetric inference with cost-volume export."""

    cfg: Mast3rConfig

    def setup(self):
        c = self.cfg.croco
        self.encoder = CrocoEncoder(c, name="encoder")
        self.decoder_embed = nn.Dense(c.dec_embed_dim, use_bias=True,
                                      name="decoder_embed")
        ScannedPairs = nn.scan(
            CrocoDecoderPair,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=c.dec_depth,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        self.dec_pairs = ScannedPairs(c, collect_attn=True, name="dec_pairs")
        self.dec_norm = nn.LayerNorm(epsilon=c.layernorm_eps, name="dec_norm")
        self.head1 = Mast3rHead(self.cfg, name="head1")
        self.head2 = Mast3rHead(self.cfg, name="head2")

    def _decoder(self, f1, pos1, f2, pos2):
        """model.py:297-322: dual 12-layer cross decoder (weight-stacked
        scan), per-layer outputs + head-meaned attn maps."""
        g1 = self.decoder_embed(f1)
        g2 = self.decoder_embed(f2)
        _, (ys1, ys2, cam1, cam2) = self.dec_pairs((g1, g2), pos1, pos2)
        out1 = [f1] + [ys1[i] for i in range(ys1.shape[0])]
        out2 = [f2] + [ys2[i] for i in range(ys2.shape[0])]
        out1[-1] = self.dec_norm(out1[-1])
        out2[-1] = self.dec_norm(out2[-1])
        camaps1 = [cam1[i] for i in range(cam1.shape[0])]
        camaps2 = [cam2[i] for i in range(cam2.shape[0])]
        return out1, out2, camaps1, camaps2

    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray,
                 temperature: jnp.ndarray | float = 1.0) -> Dict:
        """img1, img2: (B, H, W, 3) in [-1, 1], W >= H. Returns res1/res2
        dicts over the symmetrized batch of 2B (element order [img2->img1,
        img1->img2] repeated per pair)."""
        B, H, W, _ = img1.shape
        ps = self.cfg.croco.patch_size
        gh, gw = H // ps, W // ps

        feats, pos = self.encoder(jnp.concatenate([img1, img2], axis=0))
        f1, f2 = feats[:B], feats[B:]
        p1, p2 = pos[:B], pos[B:]

        # symmetrized direction batch: elem 0 view1=img2, elem 1 view1=img1
        v1 = jnp.concatenate([f2, f1], axis=0)
        v2 = jnp.concatenate([f1, f2], axis=0)
        pv1 = jnp.concatenate([p2, p1], axis=0)
        pv2 = jnp.concatenate([p1, p2], axis=0)

        out1, out2, camaps1, camaps2 = self._decoder(v1, pv1, v2, pv2)

        hooks = self.cfg.head_hooks
        res1 = self.head1(
            [out1[h] for h in hooks], out1[0], out1[-1], (gh, gw)
        )
        res2 = self.head2(
            [out2[h] for h in hooks], out2[0], out2[-1], (gh, gw)
        )

        # reciprocity + temperature softmax (model.py:346-363), vectorized
        # over the stacked layer axis; col-0 set to each LAYER's global min.
        m1 = jnp.stack(camaps1, axis=0)  # (L, 2B, N, N)
        m2 = jnp.stack(camaps2, axis=0)
        m = (m1 + jnp.swapaxes(m2, -1, -2)) / 2.0
        m = jax.nn.softmax(m / temperature, axis=-1)
        layer_min = jnp.min(m, axis=(1, 2, 3), keepdims=False)
        m = m.at[:, :, :, 0].set(layer_min[:, None, None])
        res2["tgt_attn_map"] = jnp.mean(m, axis=0)

        res2["pts3d_in_other_view"] = res2.pop("pts3d")
        return {"res1": res1, "res2": res2}
