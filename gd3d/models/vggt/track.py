"""VGGT track head: DPT feature extractor + CoTracker-style predictor.

Parity targets: vggt/heads/track_head.py:12-108,
track_modules/base_track_predictor.py:17-208 (corr pyramid levels 7 radius
4, iterative transformer refinement), track_modules/blocks.py
(EfficientUpdateFormer with 64 virtual tracks, CorrBlock), modules.py
(AttnBlock/CrossAttnBlock — NOTE these reassign x to norm1(x) before the
residual; quirk preserved), utils.py (sincos embeds, bilinear_sampler with
align_corners=True and zero padding).

The gather-heavy corr sampling is expressed as static-shape bilinear gathers
vmapped over tracks (SURVEY.md §7 hard-part 4).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.heads import VggtDPTHead


# ------------------------------------------------------------ embeddings
def get_2d_embedding(xy: jnp.ndarray, C: int) -> jnp.ndarray:
    """track_modules/utils.py:93-124 (cat_coords=False)."""
    B, N, _ = xy.shape
    x = xy[:, :, 0:1]
    y = xy[:, :, 1:2]
    div = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C)).reshape(1, 1, C // 2)
    pe_x = jnp.zeros((B, N, C), jnp.float32)
    pe_y = jnp.zeros((B, N, C), jnp.float32)
    pe_x = pe_x.at[:, :, 0::2].set(jnp.sin(x * div))
    pe_x = pe_x.at[:, :, 1::2].set(jnp.cos(x * div))
    pe_y = pe_y.at[:, :, 0::2].set(jnp.sin(y * div))
    pe_y = pe_y.at[:, :, 1::2].set(jnp.cos(y * div))
    return jnp.concatenate([pe_x, pe_y], axis=2)


def get_2d_sincos_pos_embed_grid(embed_dim: int, gh: int, gw: int) -> jnp.ndarray:
    """(gh, gw, D) sincos embed (track_modules/utils.py:18-90)."""
    def emb1d(pos):
        omega = np.arange(embed_dim // 4, dtype=np.float64) / (embed_dim / 4.0)
        omega = 1.0 / 10000.0**omega
        out = pos.reshape(-1)[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    # reference: grid = stack(meshgrid(grid_w, grid_h, 'xy')) — grid[0] is
    # the w-index map, grid[1] the h-index map (track_modules/utils.py)
    gw_grid, gh_grid = np.meshgrid(np.arange(gw), np.arange(gh))  # 'xy'
    emb_h = emb1d(gw_grid.astype(np.float64))
    emb_w = emb1d(gh_grid.astype(np.float64))
    emb = np.concatenate([emb_h, emb_w], axis=1).reshape(gh, gw, embed_dim)
    return jnp.asarray(emb, jnp.float32)


def bilinear_sample_zero(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W) map at pixel coords (N, 2) (x, y), align_corners=True
    convention with zero padding out of range."""
    H, W = img.shape
    x, y = coords[:, 0], coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yi = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        return jnp.where(inb, img[yi, xi], 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (v00 * (1 - tx) + v01 * tx) * (1 - ty) + (v10 * (1 - tx) + v11 * tx) * ty


def sample_features4d(fmap: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """fmap (H, W, C), coords (N, 2) -> (N, C); bilinear, zeros padding."""
    return jax.vmap(
        lambda ch: bilinear_sample_zero(ch, coords), in_axes=2, out_axes=1
    )(fmap)


# --------------------------------------------------------------- modules
class TorchMHA(nn.Module):
    """nn.MultiheadAttention-compatible module (packed in_proj + out_proj)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v):
        E, H = self.dim, self.num_heads
        D = E // H
        in_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(),
                          (3 * E, E))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        qp = q @ in_w[:E].T + in_b[:E]
        kp = k @ in_w[E : 2 * E].T + in_b[E : 2 * E]
        vp = v @ in_w[2 * E :].T + in_b[2 * E :]

        B, Nq, _ = qp.shape
        Nk = kp.shape[1]
        qh = qp.reshape(B, Nq, H, D).transpose(0, 2, 1, 3)
        kh = kp.reshape(B, Nk, H, D).transpose(0, 2, 1, 3)
        vh = vp.reshape(B, Nk, H, D).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", qh * (D**-0.5), kh), axis=-1
        )
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, E)
        return nn.Dense(E, name="out_proj")(out)


class TrackMlp(nn.Module):
    dim_out: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim_out, name="fc2")(x)


class AttnBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)  # quirk: residual from normed x
        x = x + TorchMHA(self.dim, self.num_heads, name="attn")(x, x, x)
        x = x + TrackMlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        return x


class CrossAttnBlock(nn.Module):
    dim: int
    num_heads: int = 1
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, context):
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        context = nn.LayerNorm(epsilon=1e-5, name="norm_context")(context)
        x = x + TorchMHA(self.dim, self.num_heads, name="cross_attn")(
            x, context, context
        )
        x = x + TrackMlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        return x


class EfficientUpdateFormer(nn.Module):
    """track_modules/blocks.py:19-145."""

    cfg: VggtConfig
    input_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        hs = cfg.track_hidden_size
        B, N, T, _ = x.shape
        x = nn.LayerNorm(epsilon=1e-5, name="input_norm")(x)
        tokens = nn.Dense(hs, name="input_transform")(x)
        init_tokens = tokens

        virtual = self.param(
            "virtual_tracks", nn.initializers.normal(1.0),
            (1, cfg.num_virtual_tracks, 1, hs),
        )
        tokens = jnp.concatenate(
            [tokens, jnp.tile(virtual, (B, 1, T, 1))], axis=1
        )
        Nv = tokens.shape[1]
        n_space = cfg.track_depth  # space_depth == time_depth
        j = 0
        for i in range(cfg.track_depth):
            tt = tokens.reshape(B * Nv, T, hs)
            tt = AttnBlock(hs, 8, name=f"time_{i}")(tt)
            tokens = tt.reshape(B, Nv, T, hs)
            if i % max(1, cfg.track_depth // n_space) == 0:
                st = tokens.transpose(0, 2, 1, 3).reshape(B * T, Nv, hs)
                pt = st[:, : Nv - cfg.num_virtual_tracks]
                vt = st[:, Nv - cfg.num_virtual_tracks :]
                vt = CrossAttnBlock(hs, 8, name=f"v2p_{j}")(vt, pt)
                vt = AttnBlock(hs, 8, name=f"space_{j}")(vt)
                pt = CrossAttnBlock(hs, 8, name=f"p2v_{j}")(pt, vt)
                st = jnp.concatenate([pt, vt], axis=1)
                tokens = st.reshape(B, T, Nv, hs).transpose(0, 2, 1, 3)
                j += 1
        tokens = tokens[:, : Nv - cfg.num_virtual_tracks]
        tokens = tokens + init_tokens
        tokens = nn.LayerNorm(epsilon=1e-5, name="output_norm")(tokens)
        return nn.Dense(self.output_dim, name="flow_head")(tokens)


class BaseTrackerPredictor(nn.Module):
    """track_modules/base_track_predictor.py:17-208."""

    cfg: VggtConfig

    @nn.compact
    def __call__(self, query_points: jnp.ndarray, fmaps: jnp.ndarray,
                 iters: Optional[int] = None):
        """query_points (B, N, 2) full-res pixels; fmaps (B, S, Hf, Wf, C)
        (already /stride resolution). Returns (coords_list, vis, conf)."""
        cfg = self.cfg
        iters = iters or cfg.track_iters
        B, N, _ = query_points.shape
        _, S, HH, WW, C = fmaps.shape
        r = cfg.corr_radius
        L = cfg.corr_levels

        fmaps = nn.LayerNorm(epsilon=1e-5, name="fmap_norm")(fmaps)
        qp = query_points / float(cfg.track_stride)
        coords = jnp.tile(qp[:, None], (1, S, 1, 1))  # (B, S, N, 2)

        query_track_feat = jax.vmap(sample_features4d)(fmaps[:, 0], coords[:, 0])
        track_feats = jnp.tile(query_track_feat[:, None], (1, S, 1, 1))
        coords_backup = coords

        # corr pyramid fmaps
        pyramid = [fmaps]
        cur = fmaps
        for _ in range(L - 1):
            Bc, Sc, Hc, Wc, Cc = cur.shape
            cur = cur.reshape(Bc * Sc, Hc, Wc, Cc)
            cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
            cur = cur.reshape(Bc, Sc, cur.shape[1], cur.shape[2], Cc)
            pyramid.append(cur)

        ga, gb = jnp.meshgrid(
            jnp.linspace(-r, r, 2 * r + 1), jnp.linspace(-r, r, 2 * r + 1),
            indexing="ij",
        )
        # the reference stacks meshgrid(dy, dx, 'ij') and adds it to (x, y)
        # coordinates (blocks.py:184 + corr_sample) — so the window's ROW
        # index drives the X offset; stacking (dx, dy) would transpose the
        # flattened window order corr_mlp's pretrained weights expect
        delta = jnp.stack([ga, gb], axis=-1).reshape(-1, 2)  # (x=row, y=col)

        corr_mlp = TrackMlp(C, cfg.track_hidden_size, name="corr_mlp")
        updater = EfficientUpdateFormer(
            cfg, input_dim=3 * C + 4, output_dim=C + 2, name="updateformer"
        )
        query_ref_token = self.param(
            "query_ref_token", nn.initializers.normal(1.0), (1, 2, 3 * C + 4)
        )
        ffeat_norm = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="ffeat_norm")
        ffeat_updater = nn.Dense(C, name="ffeat_updater")
        vis_predictor = nn.Dense(1, name="vis_predictor")
        conf_predictor = nn.Dense(1, name="conf_predictor")

        pos_grid = get_2d_sincos_pos_embed_grid(3 * C + 4, HH, WW)
        sampled_pos = jax.vmap(sample_features4d, in_axes=(None, 0))(
            pos_grid, coords[:, 0]
        )  # (B, N, D)

        def corr_sample(track_feats, coords):
            # (B, S, N, L*(2r+1)^2): per-level correlation, sampled at the
            # (scaled) track centroid + delta window, zeros out of range.
            outs = []
            for lvl, fm in enumerate(pyramid):
                Hl, Wl = fm.shape[2], fm.shape[3]
                corr = jnp.einsum("bsnc,bshwc->bsnhw", track_feats, fm)
                corr = corr / math.sqrt(C)
                centers = coords / (2.0**lvl)
                corr_flat = corr.reshape(B * S * N, Hl, Wl)
                pts = centers.reshape(B * S * N, 1, 2) + delta[None]  # (BSN, K, 2)
                sampled = jax.vmap(bilinear_sample_zero)(corr_flat, pts)
                outs.append(sampled.reshape(B, S, N, -1))
            return jnp.concatenate(outs, axis=-1)

        coord_preds = []
        for _ in range(iters):
            coords = jax.lax.stop_gradient(coords)
            fcorrs = corr_sample(track_feats, coords)
            corr_dim = fcorrs.shape[-1]
            fcorrs_ = fcorrs.transpose(0, 2, 1, 3).reshape(B * N, S, corr_dim)
            fcorrs_ = corr_mlp(fcorrs_)

            flows = (coords - coords[:, 0:1]).transpose(0, 2, 1, 3).reshape(
                B * N, S, 2
            )
            flows_emb = get_2d_embedding(flows, C // 2)
            flows_emb = jnp.concatenate(
                [flows_emb, flows / cfg.track_max_scale,
                 flows / cfg.track_max_scale], axis=-1,
            )
            track_feats_ = track_feats.transpose(0, 2, 1, 3).reshape(B * N, S, C)
            tf_in = jnp.concatenate([flows_emb, fcorrs_, track_feats_], axis=2)

            spe = sampled_pos.reshape(B * N, 1, -1)
            x = tf_in + spe
            qrt = jnp.concatenate(
                [query_ref_token[:, 0:1],
                 jnp.tile(query_ref_token[:, 1:2], (1, S - 1, 1))], axis=1,
            )
            x = x + qrt
            x = x.reshape(B, N, S, -1)
            delta_out = updater(x)
            delta_out = delta_out.reshape(B * N, S, -1)
            d_coords = delta_out[:, :, :2]
            d_feats = delta_out[:, :, 2:].reshape(B * N * S, C)

            tf_flat = track_feats_.reshape(B * N * S, C)
            tf_flat = (
                nn.gelu(ffeat_updater(ffeat_norm(d_feats)), approximate=False)
                + tf_flat
            )
            track_feats = tf_flat.reshape(B, N, S, C).transpose(0, 2, 1, 3)

            coords = coords + d_coords.reshape(B, N, S, 2).transpose(0, 2, 1, 3)
            coords = coords.at[:, 0].set(coords_backup[:, 0])
            coord_preds.append(coords * cfg.track_stride)

        tf = track_feats.reshape(B * S * N, C)
        vis = jax.nn.sigmoid(vis_predictor(tf).reshape(B, S, N))
        conf = jax.nn.sigmoid(conf_predictor(tf).reshape(B, S, N))
        return coord_preds, vis, conf


class TrackHead(nn.Module):
    """track_head.py:12-108: DPT feature extractor (down_ratio 2) + tracker."""

    cfg: VggtConfig

    @nn.compact
    def __call__(self, tokens_list, image_hw, query_points, iters=None):
        cfg = self.cfg
        fmaps = VggtDPTHead(
            cfg,
            features=cfg.track_features,
            feature_only=True,
            down_ratio=2,
            use_pos_embed=False,
            name="feature_extractor",
        )(tokens_list, image_hw)  # (B, S, H/2, W/2, C)
        return BaseTrackerPredictor(cfg, name="tracker")(
            query_points, fmaps, iters=iters
        )
