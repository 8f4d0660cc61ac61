"""VGGT torch parity at tiny scale: DINOv2 patchifier + alternating-attention
aggregator (with the forked cross-frame export), camera head, and DPT head
transcribed in torch with upstream state names, vs flax + converter."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gd3d.models.vggt.aggregator import Aggregator
from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.heads import CameraHead
from gd3d.teachers.vggt import convert_vggt
from gd3d.teachers.convert import _linear, _layernorm
from tests.test_mast3r_model import TRoPE2D

TINY = VggtConfig(
    img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
    num_register_tokens=4, dino_depth=2, dino_num_heads=2,
    camera_trunk_depth=1, camera_iterations=2, dpt_features=8,
    dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
    track_features=8, track_iters=1, track_stride=2, corr_levels=2,
    corr_radius=1, track_hidden_size=16, track_depth=2,
    num_virtual_tracks=4,
)


class TVAttn(nn.Module):
    def __init__(self, dim, heads, qk_norm, rope, eps=1e-6):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        hd = dim // heads
        self.q_norm = nn.LayerNorm(hd, eps=eps) if qk_norm else nn.Identity()
        self.k_norm = nn.LayerNorm(hd, eps=eps) if qk_norm else nn.Identity()
        self.rope = rope
        self.scale = hd**-0.5

    def forward(self, x, pos=None, return_attn=False, temperature=1.0):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, C // self.heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        q, k = self.q_norm(q), self.k_norm(k)
        if self.rope is not None and pos is not None:
            q = self.rope(q, pos)
            k = self.rope(k, pos)
        qs = q * self.scale
        attn = (qs @ k.transpose(-2, -1)).softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        out = self.proj(out)
        amap = None
        if return_attn:
            s = 5
            half = N // 2
            s1 = qs[..., s:half, :] @ k[..., half + s :, :].transpose(-2, -1)
            s2 = qs[..., half + s :, :] @ k[..., s:half, :].transpose(-2, -1)
            a1 = (s1 / temperature).softmax(dim=-1)
            a2 = (s2 / temperature).softmax(dim=-1)
            amap = torch.cat([a1, a2], dim=0)
        return out, amap


class TVBlock(nn.Module):
    # the real aggregator/camera blocks take torch DEFAULT LayerNorm
    # (eps 1e-5, aggregator.py:80-107); only the DINOv2 tower pins 1e-6
    def __init__(self, dim, heads, qk_norm, rope, ls_init, eps=1e-5):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = TVAttn(dim, heads, qk_norm, rope, eps=eps)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, 4 * dim)
        mlp.fc2 = nn.Linear(4 * dim, dim)
        self.mlp = mlp
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.full((dim,), ls_init))
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.full((dim,), ls_init))

    def forward(self, x, pos=None, return_attn=False, temperature=1.0):
        a, amap = self.attn(self.norm1(x), pos, return_attn, temperature)
        x = x + a * self.ls1.gamma
        m = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        x = x + m * self.ls2.gamma
        return x, amap


class TAggregator(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.embed_dim
        rope = TRoPE2D()
        pe = nn.Module()
        proj_holder = nn.Module()
        proj_holder.proj = nn.Conv2d(3, d, 14, 14)
        pe.patch_embed = proj_holder
        pe.cls_token = nn.Parameter(torch.randn(1, 1, d) * 0.02)
        g = cfg.img_size // cfg.patch_size
        pe.pos_embed = nn.Parameter(torch.randn(1, g * g + 1, d) * 0.02)
        pe.register_tokens = nn.Parameter(
            torch.randn(1, cfg.num_register_tokens, d) * 0.02
        )
        pe.blocks = nn.ModuleList(
            [TVBlock(d, cfg.dino_num_heads, False, None, 1.0, eps=1e-6)
             for _ in range(cfg.dino_depth)]
        )
        pe.norm = nn.LayerNorm(d, eps=1e-6)
        self.patch_embed = pe
        self.camera_token = nn.Parameter(torch.randn(1, 2, 1, d) * 1e-6)
        self.register_token = nn.Parameter(
            torch.randn(1, 2, cfg.num_register_tokens, d) * 1e-6
        )
        self.frame_blocks = nn.ModuleList(
            [TVBlock(d, cfg.num_heads, True, rope, 0.01)
             for _ in range(cfg.depth)]
        )
        self.global_blocks = nn.ModuleList(
            [TVBlock(d, cfg.num_heads, True, rope, 0.01)
             for _ in range(cfg.depth)]
        )
        self.cfg = cfg

    def forward(self, images, temperature=1.0):
        # images (B, S, 3, H, W) already resnet-normalized by caller
        cfg = self.cfg
        B, S, _, H, W = images.shape
        x = images.reshape(B * S, 3, H, W)
        x = self.patch_embed.patch_embed.proj(x)
        gh, gw = x.shape[-2:]
        x = x.flatten(2).transpose(1, 2)
        x = torch.cat(
            [self.patch_embed.cls_token.expand(B * S, -1, -1), x], 1
        )
        x = x + self.patch_embed.pos_embed  # square => no interpolation
        x = torch.cat(
            [x[:, :1],
             self.patch_embed.register_tokens.expand(B * S, -1, -1),
             x[:, 1:]], 1,
        )
        for blk in self.patch_embed.blocks:
            x, _ = blk(x)
        x = self.patch_embed.norm(x)
        patch_tokens = x[:, 1 + cfg.num_register_tokens :]

        def sef(tok):
            first = tok[:, 0:1].expand(B, 1, *tok.shape[2:])
            rest = tok[:, 1:2].expand(B, S - 1, *tok.shape[2:])
            return torch.cat([first, rest], 1).reshape(B * S, *tok.shape[2:])

        tokens = torch.cat(
            [sef(self.camera_token), sef(self.register_token), patch_tokens], 1
        )
        P = tokens.shape[1]
        ys, xs = torch.meshgrid(torch.arange(gh), torch.arange(gw),
                                indexing="ij")
        pos_patch = torch.stack([ys, xs], -1).reshape(1, -1, 2).expand(
            B * S, -1, -1
        ) + 1
        psi = cfg.patch_start_idx
        pos = torch.cat(
            [torch.zeros(B * S, psi, 2, dtype=torch.long), pos_patch], 1
        )

        outputs = []
        amaps = []
        for i in range(cfg.depth):
            tokens, _ = self.frame_blocks[i](tokens, pos)
            frame_inter = tokens.reshape(B, S, P, -1)
            gt = tokens.reshape(B, S * P, -1)
            gpos = pos.reshape(B, S * P, 2)
            gt, amap = self.global_blocks[i](
                gt, gpos, return_attn=True, temperature=temperature
            )
            amaps.append(amap.mean(1))
            tokens = gt.reshape(B * S, P, -1)
            outputs.append(
                torch.cat([frame_inter, gt.reshape(B, S, P, -1)], -1)
            )
        return outputs, torch.stack(amaps).mean(0)


def test_aggregator_matches_torch():
    torch.manual_seed(0)
    tagg = TAggregator(TINY).eval()
    state = {f"aggregator.{k}": v.detach().numpy()
             for k, v in tagg.state_dict().items()}
    params = convert_vggt(state, TINY)["aggregator"]

    rng = np.random.RandomState(0)
    imgs = rng.rand(1, 2, 28, 28, 3).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    timgs = torch.from_numpy(
        ((imgs - mean) / std).transpose(0, 1, 4, 2, 3)
    )
    with torch.no_grad():
        touts, tattn = tagg(timgs, temperature=0.9)

    agg = Aggregator(TINY)
    outs, attn = agg.apply(
        {"params": params}, jnp.asarray(imgs), temperature=0.9
    )
    for i in range(TINY.depth):
        np.testing.assert_allclose(
            np.asarray(outs[i]), touts[i].numpy(), rtol=3e-3, atol=3e-5
        )
    np.testing.assert_allclose(
        np.asarray(attn), tattn.numpy(), rtol=3e-3, atol=3e-5
    )


class TCameraHead(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        dim = 2 * cfg.embed_dim
        self.token_norm = nn.LayerNorm(dim)
        self.trunk = nn.ModuleList(
            [TVBlock(dim, cfg.num_heads, False, None, 0.01)
             for _ in range(cfg.camera_trunk_depth)]
        )
        self.trunk_norm = nn.LayerNorm(dim)
        self.empty_pose_tokens = nn.Parameter(torch.zeros(1, 1, 9))
        self.embed_pose = nn.Linear(9, dim)
        self.poseLN_modulation = nn.Linear(dim, 3 * dim)
        self.adaln_norm = nn.LayerNorm(dim, elementwise_affine=False, eps=1e-6)
        pb = nn.Module()
        pb.fc1 = nn.Linear(dim, dim // 2)
        pb.fc2 = nn.Linear(dim // 2, 9)
        self.pose_branch = pb
        self.cfg = cfg

    def forward(self, last_tokens, iters):
        pose_tokens = self.token_norm(last_tokens[:, :, 0])
        B, S, _ = pose_tokens.shape
        pred = None
        for _ in range(iters):
            if pred is None:
                mi = self.embed_pose(self.empty_pose_tokens.expand(B, S, -1))
            else:
                mi = self.embed_pose(pred.detach())
            mod = self.poseLN_modulation(F.silu(mi))
            shift, scale, gate = mod.chunk(3, dim=-1)
            h = gate * (self.adaln_norm(pose_tokens) * (1 + scale) + shift)
            h = h + pose_tokens
            for blk in self.trunk:
                h, _ = blk(h)
            delta = self.pose_branch.fc2(
                F.gelu(self.pose_branch.fc1(self.trunk_norm(h)))
            )
            pred = delta if pred is None else pred + delta
        T, quat, fl = pred[..., :3], pred[..., 3:7], pred[..., 7:]
        return torch.cat([T, quat, F.relu(fl)], -1)


def test_camera_head_matches_torch():
    from gd3d.teachers.vggt import convert_vggt_camera_head

    torch.manual_seed(1)
    tch = TCameraHead(TINY).eval()
    state = {f"camera_head.{k}": v.detach().numpy()
             for k, v in tch.state_dict().items()}
    params = convert_vggt_camera_head(state, TINY)

    rng = np.random.RandomState(1)
    tokens = rng.randn(1, 2, 9, 2 * TINY.embed_dim).astype(np.float32)
    with torch.no_grad():
        want = tch(torch.from_numpy(tokens), TINY.camera_iterations).numpy()
    got = np.asarray(
        CameraHead(TINY).apply(
            {"params": params}, jnp.asarray(tokens),
            num_iterations=TINY.camera_iterations,
        )
    )
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-5)


class TVDPT(nn.Module):
    """Torch transcription of vggt/heads/dpt_head.py (depth-head flavor)."""

    def __init__(self, cfg, output_dim=2):
        super().__init__()
        dim_in = 2 * cfg.embed_dim
        oc = cfg.dpt_out_channels
        feat = cfg.dpt_features
        self.norm = nn.LayerNorm(dim_in)
        self.projects = nn.ModuleList(
            [nn.Conv2d(dim_in, c, 1) for c in oc]
        )
        self.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(oc[0], oc[0], 4, 4),
            nn.ConvTranspose2d(oc[1], oc[1], 2, 2),
            nn.Identity(),
            nn.Conv2d(oc[3], oc[3], 3, 2, 1),
        ])
        self.scratch = nn.Module()
        for i, c in enumerate(oc):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, feat, 3, padding=1, bias=False))
        from tests.test_mast3r_full_parity import TFusion

        for i in range(1, 5):
            fb = TFusion(feat)
            if i == 4:
                del fb.resConfUnit1
            setattr(self.scratch, f"refinenet{i}", fb)
        self.scratch.output_conv1 = nn.Conv2d(feat, feat // 2, 3, padding=1)
        self.scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(feat // 2, 32, 3, padding=1), nn.ReLU(),
            nn.Conv2d(32, output_dim, 1),
        )
        self.cfg = cfg
        self.output_dim = output_dim

    @staticmethod
    def _pos_embed(x, W, H):
        pw, ph = x.shape[-1], x.shape[-2]
        aspect = W / H
        diag = (aspect**2 + 1.0) ** 0.5
        sx, sy = aspect / diag, 1.0 / diag
        xs = torch.linspace(-sx * (pw - 1) / pw, sx * (pw - 1) / pw, pw)
        ys = torch.linspace(-sy * (ph - 1) / ph, sy * (ph - 1) / ph, ph)
        uu, vv = torch.meshgrid(xs, ys, indexing="xy")
        grid = torch.stack([uu, vv], -1)

        def emb1d(dim, pos):
            omega = torch.arange(dim // 2, dtype=torch.double) / (dim / 2.0)
            omega = 1.0 / 100.0**omega
            out = pos.reshape(-1).double()[:, None] * omega[None]
            return torch.cat([out.sin(), out.cos()], 1)

        C = x.shape[1]
        emb = torch.cat(
            [emb1d(C // 2, grid[..., 0]), emb1d(C // 2, grid[..., 1])], 1
        ).reshape(ph, pw, C).float()
        return x + 0.1 * emb.permute(2, 0, 1)[None]

    @staticmethod
    def _rcu_inplace(m, x):
        # VGGT's _make_fusion_block passes nn.ReLU(inplace=True)
        # (dpt_head.py:315): `out = relu(x)` mutates x, so the residual
        # add at :399 actually adds relu(x) — unlike the dust3r DPT
        # (nn.ReLU(False)) that TFusion transcribes
        xr = F.relu(x)
        out = m.conv1(xr)
        out = F.relu(out)
        out = m.conv2(out)
        return out + xr

    def _fusion(self, fb, x, skip=None, size=None):
        if skip is not None:
            x = x + self._rcu_inplace(fb.resConfUnit1, skip)
        x = self._rcu_inplace(fb.resConfUnit2, x)
        if size is None:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=True)
        else:
            x = F.interpolate(x, size=size, mode="bilinear",
                              align_corners=True)
        return fb.out_conv(x)

    def forward(self, tokens_list, images_hw):
        cfg = self.cfg
        H, W = images_hw
        ph, pw = H // cfg.patch_size, W // cfg.patch_size
        psi = cfg.patch_start_idx
        feats = []
        for idx, hook in enumerate(cfg.dpt_hooks):
            t = tokens_list[hook][:, :, psi:]
            B, S, P, C2 = t.shape
            x = self.norm(t.reshape(B * S, P, C2))
            x = x.permute(0, 2, 1).reshape(B * S, C2, ph, pw)
            x = self.projects[idx](x)
            x = self._pos_embed(x, W, H)
            x = self.resize_layers[idx](x)
            feats.append(x)
        rn = [getattr(self.scratch, f"layer{i + 1}_rn")(f)
              for i, f in enumerate(feats)]
        out = self._fusion(self.scratch.refinenet4, rn[3],
                           size=rn[2].shape[2:])
        out = self._fusion(self.scratch.refinenet3, out, rn[2],
                           size=rn[1].shape[2:])
        out = self._fusion(self.scratch.refinenet2, out, rn[1],
                           size=rn[0].shape[2:])
        out = self._fusion(self.scratch.refinenet1, out, rn[0])
        out = self.scratch.output_conv1(out)
        out = F.interpolate(out, size=(H, W), mode="bilinear",
                            align_corners=True)
        out = self._pos_embed(out, W, H)
        out = self.scratch.output_conv2(out)
        out = out.permute(0, 2, 3, 1)
        pts = out[..., :-1].exp()
        conf = 1 + out[..., -1].exp()
        return pts, conf


def test_vggt_dpt_head_matches_torch():
    from gd3d.models.vggt.heads import VggtDPTHead
    from gd3d.teachers.vggt import _convert_vggt_dpt

    torch.manual_seed(2)
    tdpt = TVDPT(TINY, output_dim=2).eval()
    state = {f"depth_head.{k}": v.detach().numpy()
             for k, v in tdpt.state_dict().items()}
    params = _convert_vggt_dpt(state, "depth_head", TINY)

    rng = np.random.RandomState(2)
    tokens = [
        jnp.asarray(rng.randn(1, 2, 9, 2 * TINY.embed_dim), jnp.float32)
        for _ in range(TINY.depth)
    ]
    with torch.no_grad():
        tw_pts, tw_conf = tdpt(
            [torch.from_numpy(np.asarray(t)) for t in tokens], (28, 28)
        )
    pts, conf = VggtDPTHead(
        TINY, output_dim=2, activation="exp", conf_activation="expp1",
        features=TINY.dpt_features,
    ).apply({"params": params}, tokens, (28, 28))
    np.testing.assert_allclose(
        np.asarray(pts).reshape(2, 28, 28, 1), tw_pts.numpy(),
        rtol=5e-3, atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(conf).reshape(2, 28, 28), tw_conf.numpy(),
        rtol=5e-3, atol=5e-4,
    )
