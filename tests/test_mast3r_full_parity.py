"""FULL-model MASt3R parity: a torch transcription of the tiny
AsymmetricMASt3R graph (encoder, dual decoder, DPT + catmlp head,
reciprocity/temperature cost export) with upstream state_dict names, run
against the flax model with converted weights. Locks teacher numerical
parity end-to-end (SURVEY.md §7 hard-part 1)."""
import pytest

pytestmark = pytest.mark.slow
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gd3d.models.croco import CrocoConfig
from gd3d.models.mast3r import Mast3r, Mast3rConfig
from gd3d.teachers.mast3r import convert_mast3r
from tests.test_mast3r_model import TBlock, TDecoderBlock, TRoPE2D

TINY = Mast3rConfig(
    croco=CrocoConfig(
        patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
    ),
    local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16,
)


class TFusion(nn.Module):
    def __init__(self, feat):
        super().__init__()
        def rcu():
            m = nn.Module()
            m.conv1 = nn.Conv2d(feat, feat, 3, padding=1)
            m.conv2 = nn.Conv2d(feat, feat, 3, padding=1)
            return m
        self.resConfUnit1 = rcu()
        self.resConfUnit2 = rcu()
        self.out_conv = nn.Conv2d(feat, feat, 1)

    def _rcu(self, m, x):
        out = F.relu(x)
        out = m.conv1(out)
        out = F.relu(out)
        out = m.conv2(out)
        return out + x

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self._rcu(self.resConfUnit1, skip)
        x = self._rcu(self.resConfUnit2, x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class TDPT(nn.Module):
    def __init__(self, in_dims, feat, last, out_ch):
        super().__init__()
        dims = [96, 192, 384, 768]
        self.act_postprocess = nn.ModuleList([
            nn.Sequential(nn.Conv2d(in_dims[0], dims[0], 1),
                          nn.ConvTranspose2d(dims[0], dims[0], 4, 4)),
            nn.Sequential(nn.Conv2d(in_dims[1], dims[1], 1),
                          nn.ConvTranspose2d(dims[1], dims[1], 2, 2)),
            nn.Sequential(nn.Conv2d(in_dims[2], dims[2], 1)),
            nn.Sequential(nn.Conv2d(in_dims[3], dims[3], 1),
                          nn.Conv2d(dims[3], dims[3], 3, 2, 1)),
        ])
        self.scratch = nn.Module()
        for i, d in enumerate(dims):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(d, feat, 3, padding=1, bias=False))
        for i in range(1, 5):
            setattr(self.scratch, f"refinenet{i}", TFusion(feat))
        self.head = nn.Sequential(
            nn.Conv2d(feat, feat // 2, 3, padding=1),
            nn.Identity(),  # placeholder to keep indices 0/2/4
            nn.Conv2d(feat // 2, last, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(last, out_ch, 1),
        )

    def forward(self, layers, gh, gw):
        ls = [l.transpose(1, 2).reshape(l.shape[0], -1, gh, gw) for l in layers]
        ls = [self.act_postprocess[i](l) for i, l in enumerate(ls)]
        rn = [getattr(self.scratch, f"layer{i + 1}_rn")(l)
              for i, l in enumerate(ls)]
        p4 = self.scratch.refinenet4(rn[3])[:, :, : rn[2].shape[2],
                                            : rn[2].shape[3]]
        p3 = self.scratch.refinenet3(p4, rn[2])
        p2 = self.scratch.refinenet2(p3, rn[1])
        p1 = self.scratch.refinenet1(p2, rn[0])
        x = self.head[0](p1)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        x = self.head[2](x)
        x = F.relu(x)
        return self.head[4](x)


class TMast3rHead(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.croco
        in_dims = (c.enc_embed_dim, c.dec_embed_dim, c.dec_embed_dim,
                   c.dec_embed_dim)
        self.dpt = TDPT(in_dims, cfg.dpt_feature_dim, cfg.dpt_last_dim, 4)
        idim = c.enc_embed_dim + c.dec_embed_dim
        hf = nn.Module()
        hf.fc1 = nn.Linear(idim, int(4 * idim))
        hf.fc2 = nn.Linear(int(4 * idim),
                           (cfg.local_feat_dim + 1) * c.patch_size**2)
        self.head_local_features = hf
        self.cfg = cfg

    def forward(self, hooked, enc_out, dec_out, gh, gw, H, W):
        cfg = self.cfg
        ps = cfg.croco.patch_size
        dpt_out = self.dpt(hooked, gh, gw)  # (B, 4, H, W)
        cat = torch.cat([enc_out, dec_out], dim=-1)
        lf = self.head_local_features.fc2(
            F.gelu(self.head_local_features.fc1(cat))
        )
        lf = lf.transpose(-1, -2).reshape(lf.shape[0], -1, gh, gw)
        lf = F.pixel_shuffle(lf, ps)  # (B, 7, H, W)
        out = torch.cat([dpt_out, lf], dim=1).permute(0, 2, 3, 1)
        xyz = out[..., :3]
        d = xyz.norm(dim=-1, keepdim=True)
        pts3d = xyz / d.clamp(min=1e-8) * torch.expm1(d)
        conf = 1 + out[..., 3].exp()
        desc = out[..., 4:4 + cfg.local_feat_dim]
        desc = desc / desc.norm(dim=-1, keepdim=True)
        desc_conf = out[..., 4 + cfg.local_feat_dim].exp()
        return pts3d, conf, desc, desc_conf


class TMast3r(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        c = cfg.croco
        rope = TRoPE2D()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, c.enc_embed_dim, c.patch_size, c.patch_size)
        self.patch_embed = pe
        self.enc_blocks = nn.ModuleList(
            [TBlock(c.enc_embed_dim, c.enc_num_heads, rope)
             for _ in range(c.enc_depth)]
        )
        self.enc_norm = nn.LayerNorm(c.enc_embed_dim, eps=1e-6)
        self.decoder_embed = nn.Linear(c.enc_embed_dim, c.dec_embed_dim)
        self.dec_blocks = nn.ModuleList(
            [TDecoderBlock(c.dec_embed_dim, c.dec_num_heads, rope)
             for _ in range(c.dec_depth)]
        )
        self.dec_blocks2 = nn.ModuleList(
            [TDecoderBlock(c.dec_embed_dim, c.dec_num_heads, rope)
             for _ in range(c.dec_depth)]
        )
        self.dec_norm = nn.LayerNorm(c.dec_embed_dim, eps=1e-6)
        self.downstream_head1 = TMast3rHead(cfg)
        self.downstream_head2 = TMast3rHead(cfg)
        self.cfg = cfg

    def encode(self, img):  # img (B, 3, H, W)
        x = self.patch_embed.proj(img)
        gh, gw = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)
        ys, xs = torch.meshgrid(torch.arange(gh), torch.arange(gw),
                                indexing="ij")
        pos = torch.stack([ys, xs], -1).reshape(1, -1, 2).expand(
            x.shape[0], -1, -1
        ).contiguous()
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x), pos, gh, gw

    def forward(self, img1, img2, temperature):
        f1, pos, gh, gw = self.encode(img1)
        f2, _, _, _ = self.encode(img2)
        H, W = img1.shape[-2:]
        v1 = torch.cat([f2, f1], 0)
        v2 = torch.cat([f1, f2], 0)
        pos2 = torch.cat([pos, pos], 0)

        out1 = [v1]
        out2 = [v2]
        g1 = self.decoder_embed(v1)
        g2 = self.decoder_embed(v2)
        cam1, cam2 = [], []
        for b1, b2 in zip(self.dec_blocks, self.dec_blocks2):
            n1, _, m1 = b1(g1, g2, pos2, pos2)
            n2, _, m2 = b2(g2, g1, pos2, pos2)
            g1, g2 = n1, n2
            out1.append(g1)
            out2.append(g2)
            cam1.append(m1.mean(1))
            cam2.append(m2.mean(1))
        out1[-1] = self.dec_norm(out1[-1])
        out2[-1] = self.dec_norm(out2[-1])

        hooks = self.cfg.head_hooks
        res1 = self.downstream_head1(
            [out1[h] for h in hooks], out1[0], out1[-1], gh, gw, H, W
        )
        res2 = self.downstream_head2(
            [out2[h] for h in hooks], out2[0], out2[-1], gh, gw, H, W
        )

        tgt = []
        for m1, m2 in zip(cam1, cam2):
            m = (m1 + m2.transpose(-1, -2)) / 2
            m = (m / temperature).softmax(dim=-1)
            m[:, :, 0] = m.min()
            tgt.append(m)
        tgt_attn = torch.stack(tgt, 1).mean(1)
        return res1, res2, tgt_attn


def test_mast3r_full_model_matches_torch():
    torch.manual_seed(0)
    tm = TMast3r(TINY).eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_mast3r(state, TINY)

    rng = np.random.RandomState(0)
    H, W = 32, 64
    i1 = (rng.rand(1, H, W, 3) * 2 - 1).astype(np.float32)
    i2 = (rng.rand(1, H, W, 3) * 2 - 1).astype(np.float32)
    with torch.no_grad():
        tres1, tres2, ttgt = tm(
            torch.from_numpy(i1).permute(0, 3, 1, 2),
            torch.from_numpy(i2).permute(0, 3, 1, 2),
            0.8,
        )

    model = Mast3r(TINY)
    out = model.apply(
        {"params": params}, jnp.asarray(i1), jnp.asarray(i2), 0.8
    )
    np.testing.assert_allclose(
        np.asarray(out["res1"]["pts3d"]), tres1[0].numpy(),
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["res1"]["conf"]), tres1[1].numpy(), rtol=5e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["res1"]["desc"]), tres1[2].numpy(), rtol=5e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["res2"]["pts3d_in_other_view"]), tres2[0].numpy(),
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["res2"]["tgt_attn_map"]), ttgt.numpy(),
        rtol=5e-3, atol=1e-5,
    )
