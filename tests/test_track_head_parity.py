"""BaseTrackerPredictor torch parity at tiny scale: corr pyramid sampling,
EfficientUpdateFormer (torch MultiheadAttention), iterative refinement —
validates convert_vggt_tracker end-to-end."""
import pytest

pytestmark = pytest.mark.slow
import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.track import BaseTrackerPredictor
from gd3d.teachers.vggt import convert_vggt_tracker

TINY = VggtConfig(
    img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
    num_register_tokens=4, dino_depth=2, dino_num_heads=2,
    camera_trunk_depth=1, camera_iterations=1, dpt_features=8,
    dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
    track_features=8, track_iters=2, track_stride=2, corr_levels=2,
    corr_radius=1, track_hidden_size=16, track_depth=2,
    num_virtual_tracks=4, track_max_scale=518.0,
)


class TAttnBlock(nn.Module):
    def __init__(self, hs, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(hs)
        self.norm2 = nn.LayerNorm(hs)
        self.attn = nn.MultiheadAttention(hs, heads, batch_first=True)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(hs, 4 * hs)
        mlp.fc2 = nn.Linear(4 * hs, hs)
        self.mlp = mlp

    def forward(self, x):
        x = self.norm1(x)
        a, _ = self.attn(x, x, x)
        x = x + a
        h = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class TCrossBlock(nn.Module):
    def __init__(self, hs, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(hs)
        self.norm_context = nn.LayerNorm(hs)
        self.norm2 = nn.LayerNorm(hs)
        self.cross_attn = nn.MultiheadAttention(hs, heads, batch_first=True)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(hs, 4 * hs)
        mlp.fc2 = nn.Linear(4 * hs, hs)
        self.mlp = mlp

    def forward(self, x, ctx):
        x = self.norm1(x)
        ctx = self.norm_context(ctx)
        a, _ = self.cross_attn(x, ctx, ctx)
        x = x + a
        h = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(h)))


class TUpdateFormer(nn.Module):
    def __init__(self, cfg, input_dim, output_dim):
        super().__init__()
        hs = cfg.track_hidden_size
        self.input_norm = nn.LayerNorm(input_dim)
        self.input_transform = nn.Linear(input_dim, hs)
        self.output_norm = nn.LayerNorm(hs)
        self.flow_head = nn.Linear(hs, output_dim)
        self.virual_tracks = nn.Parameter(
            torch.randn(1, cfg.num_virtual_tracks, 1, hs)
        )
        self.time_blocks = nn.ModuleList(
            [TAttnBlock(hs, 8) for _ in range(cfg.track_depth)]
        )
        self.space_virtual_blocks = nn.ModuleList(
            [TAttnBlock(hs, 8) for _ in range(cfg.track_depth)]
        )
        self.space_point2virtual_blocks = nn.ModuleList(
            [TCrossBlock(hs, 8) for _ in range(cfg.track_depth)]
        )
        self.space_virtual2point_blocks = nn.ModuleList(
            [TCrossBlock(hs, 8) for _ in range(cfg.track_depth)]
        )
        self.nv = cfg.num_virtual_tracks

    def forward(self, x):
        B, _, T, _ = x.shape
        tokens = self.input_transform(self.input_norm(x))
        init_tokens = tokens
        tokens = torch.cat(
            [tokens, self.virual_tracks.repeat(B, 1, T, 1)], dim=1
        )
        N = tokens.shape[1]
        j = 0
        for i in range(len(self.time_blocks)):
            tt = tokens.reshape(B * N, T, -1)
            tt = self.time_blocks[i](tt)
            tokens = tt.reshape(B, N, T, -1)
            if i % (len(self.time_blocks) // len(self.space_virtual_blocks)) == 0:
                st = tokens.permute(0, 2, 1, 3).reshape(B * T, N, -1)
                pt = st[:, : N - self.nv]
                vt = st[:, N - self.nv :]
                vt = self.space_virtual2point_blocks[j](vt, pt)
                vt = self.space_virtual_blocks[j](vt)
                pt = self.space_point2virtual_blocks[j](pt, vt)
                st = torch.cat([pt, vt], 1)
                tokens = st.reshape(B, T, N, -1).permute(0, 2, 1, 3)
                j += 1
        tokens = tokens[:, : N - self.nv] + init_tokens
        return self.flow_head(self.output_norm(tokens))


def t_get_2d_embedding(xy, C):
    B, N, _ = xy.shape
    x, y = xy[:, :, 0:1], xy[:, :, 1:2]
    div = (torch.arange(0, C, 2, dtype=torch.float32) * (1000.0 / C)).reshape(
        1, 1, C // 2
    )
    pex = torch.zeros(B, N, C)
    pey = torch.zeros(B, N, C)
    pex[:, :, 0::2] = torch.sin(x * div)
    pex[:, :, 1::2] = torch.cos(x * div)
    pey[:, :, 0::2] = torch.sin(y * div)
    pey[:, :, 1::2] = torch.cos(y * div)
    return torch.cat([pex, pey], 2)


def t_sincos_grid(dim, gh, gw):
    def emb1d(pos):
        omega = torch.arange(dim // 4, dtype=torch.double) / (dim / 4.0)
        omega = 1.0 / 10000.0**omega
        out = pos.reshape(-1).double()[:, None] * omega[None]
        return torch.cat([out.sin(), out.cos()], 1)

    gx, gy = torch.meshgrid(torch.arange(gw, dtype=torch.float),
                            torch.arange(gh, dtype=torch.float),
                            indexing="xy")
    emb = torch.cat([emb1d(gx), emb1d(gy)], 1).float()
    return emb.reshape(gh, gw, dim)


def t_bilinear_zero(img, coords):
    # (H, W) map, (N, 2) (x, y), align_corners pixel convention, zero pad
    H, W = img.shape
    x, y = coords[:, 0], coords[:, 1]
    x0, y0 = x.floor(), y.floor()
    tx, ty = x - x0, y - y0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = yi.clamp(0, H - 1).long()
        xi = xi.clamp(0, W - 1).long()
        return torch.where(inb, img[yi, xi], torch.zeros(()))

    v00, v01 = tap(y0, x0), tap(y0, x0 + 1)
    v10, v11 = tap(y0 + 1, x0), tap(y0 + 1, x0 + 1)
    return (v00 * (1 - tx) + v01 * tx) * (1 - ty) + (
        v10 * (1 - tx) + v11 * tx
    ) * ty


class TTracker(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        C = cfg.track_features
        hs = cfg.track_hidden_size
        corr_dim = cfg.corr_levels * (2 * cfg.corr_radius + 1) ** 2
        cm = nn.Module()
        cm.fc1 = nn.Linear(corr_dim, hs)
        cm.fc2 = nn.Linear(hs, C)
        self.corr_mlp = cm
        tdim = 3 * C + 4
        self.query_ref_token = nn.Parameter(torch.randn(1, 2, tdim))
        self.updateformer = TUpdateFormer(cfg, tdim, C + 2)
        self.fmap_norm = nn.LayerNorm(C)
        self.ffeat_norm = nn.GroupNorm(1, C)
        self.ffeat_updater = nn.Sequential(nn.Linear(C, C), nn.GELU())
        self.vis_predictor = nn.Sequential(nn.Linear(C, 1))
        self.conf_predictor = nn.Sequential(nn.Linear(C, 1))
        self.cfg = cfg

    def forward(self, query_points, fmaps, iters):
        cfg = self.cfg
        C = cfg.track_features
        r = cfg.corr_radius
        B, S, HH, WW, _ = fmaps.shape
        N = query_points.shape[1]
        fmaps = self.fmap_norm(fmaps)
        qp = query_points / float(cfg.track_stride)
        coords = qp.reshape(B, 1, N, 2).repeat(1, S, 1, 1)

        def sample4d(fm, pts):  # fm (H, W, C), pts (N, 2)
            return torch.stack(
                [t_bilinear_zero(fm[..., c], pts) for c in range(C)], -1
            )

        qfeat = torch.stack(
            [sample4d(fmaps[b, 0], coords[b, 0]) for b in range(B)]
        )
        track_feats = qfeat.unsqueeze(1).repeat(1, S, 1, 1)
        coords_backup = coords.clone()

        pyramid = [fmaps]
        cur = fmaps
        for _ in range(cfg.corr_levels - 1):
            c = cur.permute(0, 1, 4, 2, 3).reshape(-1, C, cur.shape[2],
                                                   cur.shape[3])
            c = F.avg_pool2d(c, 2, 2)
            cur = c.reshape(B, S, C, c.shape[-2], c.shape[-1]).permute(
                0, 1, 3, 4, 2
            )
            pyramid.append(cur)
        # EXACT reference construction (vggt blocks.py:181-184): stack
        # meshgrid(dy, dx, 'ij') and add to (x, y) coords — the row index
        # drives the X offset (the transposed-window quirk)
        dy = torch.linspace(-r, r, 2 * r + 1)
        dx = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(
            torch.meshgrid(dy, dx, indexing="ij"), -1).reshape(-1, 2)

        pos_grid = t_sincos_grid(3 * C + 4, HH, WW)
        spe = torch.stack(
            [
                torch.stack(
                    [t_bilinear_zero(pos_grid[..., c], coords[b, 0])
                     for c in range(3 * C + 4)], -1,
                )
                for b in range(B)
            ]
        )  # (B, N, D)

        preds = []
        for _ in range(iters):
            coords = coords.detach()
            outs = []
            for lvl, fm in enumerate(pyramid):
                corr = torch.einsum("bsnc,bshwc->bsnhw", track_feats, fm)
                corr = corr / math.sqrt(C)
                centers = coords / (2.0**lvl)
                Hl, Wl = fm.shape[2], fm.shape[3]
                cf = corr.reshape(B * S * N, Hl, Wl)
                pts = centers.reshape(B * S * N, 1, 2) + delta[None]
                sampled = torch.stack(
                    [t_bilinear_zero(cf[i], pts[i]) for i in range(B * S * N)]
                )
                outs.append(sampled.reshape(B, S, N, -1))
            fcorrs = torch.cat(outs, -1)
            fcorrs_ = fcorrs.permute(0, 2, 1, 3).reshape(B * N, S, -1)
            fcorrs_ = self.corr_mlp.fc2(F.gelu(self.corr_mlp.fc1(fcorrs_)))
            flows = (coords - coords[:, 0:1]).permute(0, 2, 1, 3).reshape(
                B * N, S, 2
            )
            fe = t_get_2d_embedding(flows, C // 2)
            fe = torch.cat([fe, flows / cfg.track_max_scale,
                            flows / cfg.track_max_scale], -1)
            tf_ = track_feats.permute(0, 2, 1, 3).reshape(B * N, S, C)
            x = torch.cat([fe, fcorrs_, tf_], 2)
            x = x + spe.reshape(B * N, 1, -1)
            qrt = torch.cat(
                [self.query_ref_token[:, 0:1],
                 self.query_ref_token[:, 1:2].expand(-1, S - 1, -1)], 1,
            )
            x = x + qrt
            delta_out = self.updateformer(x.reshape(B, N, S, -1))
            delta_out = delta_out.reshape(B * N, S, -1)
            dc = delta_out[:, :, :2]
            df = delta_out[:, :, 2:].reshape(B * N * S, C)
            tf_flat = tf_.reshape(B * N * S, C)
            tf_flat = self.ffeat_updater(self.ffeat_norm(df)) + tf_flat
            track_feats = tf_flat.reshape(B, N, S, C).permute(0, 2, 1, 3)
            coords = coords + dc.reshape(B, N, S, 2).permute(0, 2, 1, 3)
            coords[:, 0] = coords_backup[:, 0]
            preds.append(coords * cfg.track_stride)

        tf = track_feats.reshape(B * S * N, C)
        vis = torch.sigmoid(self.vis_predictor(tf).reshape(B, S, N))
        conf = torch.sigmoid(self.conf_predictor(tf).reshape(B, S, N))
        return preds, vis, conf


def test_tracker_matches_torch():
    torch.manual_seed(0)
    tt = TTracker(TINY).eval()
    state = {f"track_head.tracker.{k}": v.detach().numpy()
             for k, v in tt.state_dict().items()}
    params = convert_vggt_tracker(state, TINY)

    rng = np.random.RandomState(0)
    B, S, HH, WW, C = 1, 2, 8, 8, TINY.track_features
    fmaps = rng.randn(B, S, HH, WW, C).astype(np.float32)
    qp = (rng.rand(B, 3, 2) * 12).astype(np.float32)

    with torch.no_grad():
        tpreds, tvis, tconf = tt(
            torch.from_numpy(qp), torch.from_numpy(fmaps), TINY.track_iters
        )

    preds, vis, conf = BaseTrackerPredictor(TINY).apply(
        {"params": params}, jnp.asarray(qp), jnp.asarray(fmaps),
        iters=TINY.track_iters,
    )
    np.testing.assert_allclose(
        np.asarray(preds[-1]), tpreds[-1].numpy(), rtol=3e-3, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(vis), tvis.numpy(), rtol=3e-3, atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(conf), tconf.numpy(), rtol=3e-3, atol=3e-4
    )
