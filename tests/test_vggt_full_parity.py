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
    def __init__(self, dim, heads, qk_norm, rope):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        hd = dim // heads
        self.q_norm = nn.LayerNorm(hd, eps=1e-6) if qk_norm else nn.Identity()
        self.k_norm = nn.LayerNorm(hd, eps=1e-6) if qk_norm else nn.Identity()
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
    def __init__(self, dim, heads, qk_norm, rope, ls_init):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TVAttn(dim, heads, qk_norm, rope)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
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
            [TVBlock(d, cfg.dino_num_heads, False, None, 1.0)
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


def _convert_camera_head(state, cfg):
    p = {
        "token_norm": _layernorm(state, "token_norm"),
        "trunk_norm": _layernorm(state, "trunk_norm"),
        "empty_pose_tokens": np.asarray(state["empty_pose_tokens"]),
        "embed_pose": _linear(state, "embed_pose"),
        "poseLN_modulation": _linear(state, "poseLN_modulation"),
        "pose_branch": {
            "fc1": _linear(state, "pose_branch.fc1"),
            "fc2": _linear(state, "pose_branch.fc2"),
        },
    }
    for i in range(cfg.camera_trunk_depth):
        b = f"trunk.{i}"
        p[f"trunk_{i}"] = {
            "norm1": _layernorm(state, f"{b}.norm1"),
            "norm2": _layernorm(state, f"{b}.norm2"),
            "attn": {
                "qkv": _linear(state, f"{b}.attn.qkv"),
                "proj": _linear(state, f"{b}.attn.proj"),
            },
            "mlp": {
                "fc1": _linear(state, f"{b}.mlp.fc1"),
                "fc2": _linear(state, f"{b}.mlp.fc2"),
            },
            "ls1": {"gamma": np.asarray(state[f"{b}.ls1.gamma"])},
            "ls2": {"gamma": np.asarray(state[f"{b}.ls2.gamma"])},
        }
    return p


def test_camera_head_matches_torch():
    torch.manual_seed(1)
    tch = TCameraHead(TINY).eval()
    state = {k: v.detach().numpy() for k, v in tch.state_dict().items()}
    params = _convert_camera_head(state, TINY)

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
