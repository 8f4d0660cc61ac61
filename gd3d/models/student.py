"""Student stack: ViT backbone + refine conv + depth head + feature APIs.

Reproduces the reference student surface used by training and eval:
  get_feature            (src/finetune_timm_mast3r.py:290-318)
  get_feature_cost       (src/finetune_timm_mast3r.py:321-342)
  get_intermediate_feature (src/finetune_timm_mast3r.py:242-288)
  forward_features dense grids for the eval harness (src/evaluate_timm.py)

All functions are pure (params passed explicitly) and NHWC. Image tensors are
float in [0, 1]; normalization constants match the reference exactly: CLIP
(OpenAI) statistics for the training-side `input_transform`, ImageNet
statistics for the eval harness (src/evaluate_timm.py:42).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from gd3d.core.config import StudentConfig
from gd3d.models.vit import DepthDiffHead, ViT, layernorm_apply, torch_linear_init
from gd3d.ops.basic import l2_normalize
from gd3d.ops.interpolate import interpolate_features

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_img(x: jnp.ndarray, mean=CLIP_MEAN, std=CLIP_STD) -> jnp.ndarray:
    m = jnp.asarray(mean, x.dtype)
    s = jnp.asarray(std, x.dtype)
    return (x - m) / s


def resize_bilinear(x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
    """torchvision functional.resize equivalent (bilinear, half-pixel)."""
    B, H, W, C = x.shape
    if (H, W) == tuple(hw):
        return x
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="bilinear")


def target_grid(h: int, w: int, target_res: int, downsample: int) -> Tuple[int, int]:
    """Patch-grid size for the target_res/downsample_factor resize.

    Matches src/finetune_timm_mast3r.py:291-295: long side -> target_res,
    then integer-divide by downsample_factor (8) for the patch grid; images
    are then resized to grid*patch_size (i.e. 2x upsample for a /16 ViT, so
    the effective feature stride over the target image is 8).
    """
    if h > w:
        tgt = (target_res, int(w * target_res / h))
    else:
        tgt = (int(h * target_res / w), target_res)
    return tgt[0] // downsample, tgt[1] // downsample


class RefineConv(nn.Module):
    """3x3 same-padding conv on NHWC features (finetune_timm_mast3r.py:147)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        fan_in = self.dim * 9
        return nn.Conv(
            self.dim,
            (3, 3),
            padding="SAME",
            kernel_init=torch_linear_init(fan_in),
            bias_init=torch_linear_init(fan_in),
            name="conv",
        )(x)


class Student:
    """Pure-functional wrapper bundling the three student modules."""

    def __init__(self, cfg: StudentConfig, me_interp_quirk: bool = False):
        self.cfg = cfg
        self.vit = ViT(cfg)
        self.refine_conv = RefineConv(cfg.embed_dim)
        self.depth_head = DepthDiffHead(
            cfg.embed_dim, cfg.depth_head_hidden, cfg.depth_head_tanh,
            dtype=cfg.dtype,
        )
        # finetune_timm_me.get_feature keeps DINO-era 14-px interp constants
        # (src/finetune_timm_me.py:155) — preserved behind this flag.
        self.me_interp_quirk = me_interp_quirk

    # ---------------------------------------------------------------- init
    def init(self, rng: jax.Array, img_size: int = 64) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        dummy = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        # jit: eager flax init dispatches thousands of tiny ops — costly
        # through the remote-device tunnel (~40 ms per dispatch)
        vit_params = jax.jit(self.vit.init)(r1, dummy)["params"]
        ph = img_size // self.cfg.patch_size
        rc_params = self.refine_conv.init(
            r2, jnp.zeros((1, ph, ph, self.cfg.embed_dim))
        )["params"]
        # pass dummy depths so the depth_attention branch params materialize
        # (checkpoint layout parity with utils/model.py:93-98)
        dh_params = self.depth_head.init(
            r3, jnp.zeros((1, 4, self.cfg.embed_dim)), jnp.zeros((1, 4))
        )["params"]
        return {
            "vit": vit_params,
            "refine_conv": rc_params,
            "depth_diff_head": dh_params,
        }

    # ------------------------------------------------------------ backbone
    def forward_tokens(
        self,
        params: dict,
        imgs: jnp.ndarray,
        stride: Optional[int] = None,
        take_indices: Sequence[int] = (),
        final_tokens: bool = True,
    ) -> dict:
        """Run the ViT on ALREADY-normalized NHWC images.

        When the caller only taps intermediate layers (final_tokens=False),
        the trunk is TRUNCATED past the deepest tapped layer: the cost
        passes tap layer 7 of 12, and the weight-stacked scan cannot DCE
        iterations 8-11 (their outputs land in the stacked ys regardless),
        so a 12-layer scan wastes a third of the trunk. A depth-sliced
        module + param view runs exactly the needed layers — identical
        numerics, ~1/3 less cost-pass compute."""
        n_need = self.cfg.depth
        if not final_tokens and take_indices:
            n_need = max(int(i) % self.cfg.depth for i in take_indices) + 1
        if n_need < self.cfg.depth:
            import dataclasses as _dc

            vit = ViT(_dc.replace(self.cfg, depth=n_need))
            n_plain = min(self.cfg.lora_start_block, n_need)
            n_adapt = n_need - n_plain
            vp = dict(params["vit"])
            if "blocks_plain" in vp:
                vp["blocks_plain"] = jax.tree_util.tree_map(
                    lambda x: x[:n_plain], vp["blocks_plain"])
            if n_adapt <= 0:
                vp.pop("blocks_adapt", None)
            elif "blocks_adapt" in vp:
                vp["blocks_adapt"] = jax.tree_util.tree_map(
                    lambda x: x[:n_adapt], vp["blocks_adapt"])
        else:
            vit, vp = self.vit, params["vit"]
        return vit.apply(
            {"params": vp},
            imgs,
            stride=stride,
            take_indices=tuple(take_indices),
            final_tokens=final_tokens,
        )

    def apply_norm(self, params: dict, tokens: jnp.ndarray) -> jnp.ndarray:
        """Final-LayerNorm only (the reference's model.norm on intermediates)."""
        return layernorm_apply(
            params["vit"]["norm"], tokens, self.cfg.layernorm_eps
        )

    def apply_refine(self, params: dict, grid_nhwc: jnp.ndarray) -> jnp.ndarray:
        return self.refine_conv.apply({"params": params["refine_conv"]}, grid_nhwc)

    # --------------------------------------------------------- feature APIs
    def _resize_for_target(self, rgbs, pts=None):
        B, H, W, _ = rgbs.shape
        ph, pw = target_grid(H, W, self.cfg.target_res, self.cfg.downsample_factor)
        ps = self.cfg.patch_size
        resized = resize_bilinear(rgbs, (ph * ps, pw * ps))
        if pts is None:
            return resized, ph, pw, None
        factor = jnp.asarray([(pw * ps) / W, (ph * ps) / H], pts.dtype)
        return resized, ph, pw, pts * factor

    def get_feature(
        self,
        params: dict,
        rgbs: jnp.ndarray,
        pts: jnp.ndarray,
        normalize: bool = True,
        global_feature: bool = False,
    ):
        """Per-keypoint descriptors after refine_conv.

        Parity: src/finetune_timm_mast3r.py:290-318. rgbs (B, H, W, 3) in
        [0,1]; pts (B, N, 2) as (x, y) in input-pixel coords.
        """
        resized, ph, pw, pts_s = self._resize_for_target(rgbs, pts)
        tokens = self.forward_tokens(params, normalize_img(resized))["tokens"]
        npfx = self.cfg.num_prefix_tokens
        global_feat = tokens[:, 0]
        grid = tokens[:, npfx:].reshape(-1, ph, pw, self.cfg.embed_dim)
        grid = self.apply_refine(params, grid)
        feat = self._interp(grid, pts_s, ph, pw)
        if normalize:
            feat = l2_normalize(feat, axis=-1)
        if global_feature:
            return feat, global_feat
        return feat

    def _interp(self, grid_nhwc, pts, ph, pw):
        ps = self.cfg.patch_size
        if self.me_interp_quirk:
            h, w, patch, stride = ph * 14, pw * 14, 14, 14
        else:
            h, w, patch, stride = ph * ps, pw * ps, ps, ps
        chw = grid_nhwc.transpose(0, 3, 1, 2)
        feat = interpolate_features(
            chw, pts, h=h, w=w, normalize=False, patch_size=patch, stride=stride
        )
        return feat.transpose(0, 2, 1)  # (B, N, C)

    def get_feature_cost(
        self, params: dict, rgbs: jnp.ndarray, normalize: bool = True
    ) -> jnp.ndarray:
        """Mean of normalized intermediate layers [4,5,6,7] as a patch grid.

        Parity: src/finetune_timm_mast3r.py:321-342 with resize=False (the
        only mode the pipeline uses). NOTE the reference's `normalize` flag
        applies model.norm (LayerNorm), not L2. Returns (B, ph, pw, C).
        """
        B, H, W, _ = rgbs.shape
        ps = self.cfg.patch_size
        out = self.forward_tokens(
            params,
            normalize_img(rgbs),
            take_indices=(4, 5, 6, 7),
            final_tokens=False,
        )["intermediates"]
        feats = []
        npfx = self.cfg.num_prefix_tokens
        for t in out:
            if normalize:
                t = self.apply_norm(params, t)
            feats.append(t[:, npfx:])
        feat = jnp.stack(feats, 0).mean(0)
        return feat.reshape(B, H // ps, W // ps, self.cfg.embed_dim)

    def get_feature_and_intermediates(
        self,
        params: dict,
        rgbs: jnp.ndarray,
        pts: jnp.ndarray,
        n: Sequence[int] = (4, 5, 6, 7),
    ):
        """Fused get_feature + get_intermediate_feature on one forward.

        The reference runs these as SEPARATE forward passes over the same
        resized input (6 student forwards/step, SURVEY.md §3.1); the outputs
        are taps of one computation, so a single ViT pass yields both —
        numerically identical, ~2x fewer student FLOPs per step.

        Returns (desc (B, N, C) L2-normalized refined features,
                 kp_feat (B, N, C) mean of normalized intermediates at pts).
        """
        resized, ph, pw, pts_s = self._resize_for_target(rgbs, pts)
        out = self.forward_tokens(
            params, normalize_img(resized), take_indices=tuple(n),
            final_tokens=True,
        )
        ps = self.cfg.patch_size
        npfx = self.cfg.num_prefix_tokens

        # matching-descriptor branch (get_feature semantics)
        grid = out["tokens"][:, npfx:].reshape(-1, ph, pw, self.cfg.embed_dim)
        grid = self.apply_refine(params, grid)
        desc = l2_normalize(self._interp(grid, pts_s, ph, pw), axis=-1)

        # intermediate-feature branch (get_intermediate_feature semantics)
        feats = []
        for t in out["intermediates"]:
            t = self.apply_norm(params, t)
            g = t[:, npfx:].reshape(-1, ph, pw, self.cfg.embed_dim)
            kp = interpolate_features(
                g.transpose(0, 3, 1, 2), pts_s, h=ph * ps, w=pw * ps,
                normalize=False, patch_size=ps, stride=ps,
            ).transpose(0, 2, 1)
            feats.append(kp)
        kp_feat = jnp.stack(feats, 0).mean(0)
        return desc, kp_feat

    def get_feature_cost_vggt(
        self,
        params: dict,
        rgbs: jnp.ndarray,
        vggt_patch: int = 14,
        layer: int = 7,
        normalize: bool = False,
    ) -> jnp.ndarray:
        """VGGT-variant cost features (src/finetune_timm_vggt.py:325-355):
        the patch-grid COUNT follows the teacher's /14 grid, the student
        resizes to grid*16 and taps intermediate layer [7] only."""
        B, H, W, _ = rgbs.shape
        ph, pw = H // vggt_patch, W // vggt_patch
        ps = self.cfg.patch_size
        resized = resize_bilinear(rgbs, (ph * ps, pw * ps))
        out = self.forward_tokens(
            params, normalize_img(resized), take_indices=(layer,),
            final_tokens=False,
        )["intermediates"][0]
        if normalize:
            out = self.apply_norm(params, out)
        out = out[:, self.cfg.num_prefix_tokens :]
        return out.reshape(B, ph, pw, self.cfg.embed_dim)

    def get_intermediate_feature(
        self,
        params: dict,
        rgbs: jnp.ndarray,
        pts: jnp.ndarray,
        n: Sequence[int] = (0, 1, 2, 3),
        return_class_token: bool = False,
        normalize: bool = True,
    ):
        """Keypoint features averaged over intermediate layers (reshape=True
        path of src/finetune_timm_mast3r.py:242-288; no refine_conv)."""
        resized, ph, pw, pts_s = self._resize_for_target(rgbs, pts)
        out = self.forward_tokens(
            params, normalize_img(resized), take_indices=tuple(n), final_tokens=False
        )["intermediates"]
        ps = self.cfg.patch_size
        npfx = self.cfg.num_prefix_tokens
        results = []
        prefixes = []
        for t in out:
            if normalize:
                t = self.apply_norm(params, t)
            prefixes.append(t[:, 0])
            grid = t[:, npfx:].reshape(-1, ph, pw, self.cfg.embed_dim)
            chw = grid.transpose(0, 3, 1, 2)
            kp = interpolate_features(
                chw, pts_s, h=ph * ps, w=pw * ps,
                normalize=False, patch_size=ps, stride=ps,
            ).transpose(0, 2, 1)
            results.append(kp)
        feat = jnp.stack(results, 0).mean(0)  # (B, N, C)
        if return_class_token:
            return feat, jnp.stack(prefixes, 0).mean(0)
        return feat

    def dense_grid_features(
        self,
        params: dict,
        imgs: jnp.ndarray,
        stride: Optional[int] = None,
        refine: bool = True,
        mean=IMAGENET_MEAN,
        std=IMAGENET_STD,
    ) -> jnp.ndarray:
        """Eval-harness dense features: forward_features -> grid -> refine.

        Parity: src/evaluate_timm.py:516-530 (PCK) and :261-281 (tracking,
        with stride patch//2). Returns (B, ph, pw, C).
        """
        ps = self.cfg.patch_size
        st = stride or ps
        B, H, W, _ = imgs.shape
        tokens = self.forward_tokens(
            params, normalize_img(imgs, mean, std), stride=st
        )["tokens"]
        ph = 1 + (H - ps) // st
        pw = 1 + (W - ps) // st
        grid = tokens[:, self.cfg.num_prefix_tokens :].reshape(
            B, ph, pw, self.cfg.embed_dim
        )
        if refine:
            grid = self.apply_refine(params, grid)
        return grid

    # ----------------------------------------------------------- depth head
    def depth_diff(self, params: dict, features: jnp.ndarray) -> jnp.ndarray:
        return self.depth_head.apply(
            {"params": params["depth_diff_head"]}, features
        )

    def pairwise_score_diff(self, params: dict, features: jnp.ndarray) -> jnp.ndarray:
        return self.depth_head.apply(
            {"params": params["depth_diff_head"]},
            features,
            method=DepthDiffHead.pairwise_score_diff,
        )

    def intra_depth_loss(
        self,
        params: dict,
        kp_feat_all: jnp.ndarray,
        kp_depth_all: jnp.ndarray,
        valid_all: jnp.ndarray,
        depth_threshold: float,
    ) -> jnp.ndarray:
        """Mean of the two per-view pairwise logistic ranking losses
        (utils/losses.py:18-41 driven by the DepthAwareFeatureFusion head).

        kp_feat_all (2B, N, C) stacked views, kp_depth_all (2B, N),
        valid_all (2B, N). With GD3D_PAIRWISE_PALLAS=1 on TPU the
        (N, N, hidden) score chain + loss runs as ONE fused Pallas kernel
        (gd3d/kernels/pairwise_rank.py — the SURVEY §2.5 'pairwise ranking
        N² expansion' target); the default is the jnp pairwise_score_diff
        path, which MEASURES EQUAL on one v5e (7.3 ms vs 7.8 ms fused at
        N=672: the op is compute-dense, so the kernel's fwd recompute in
        both backward passes costs what XLA's HBM intermediates cost —
        same lesson as the RoPE2D kernel, PERF_NOTES 'kernels must beat
        XLA's fusion'). The kernel removes the ~0.5 GB transient
        intermediates, so it may win where HBM is the binding constraint.
        Numerics match to fp32 round-off for fp32-compute configs
        (parity-tested in tests/test_pairwise_rank_kernel.py, on-chip);
        with compute_dtype=bfloat16 the jnp path runs the fusion Dense
        layers in bf16 while the fused kernel computes the whole chain in
        fp32, so the two paths differ by bf16 rounding there.
        """
        import os

        import jax as _jax

        B = kp_feat_all.shape[0] // 2
        dh = params["depth_diff_head"]
        use_fused = (
            self.cfg.depth_head_tanh
            and _jax.default_backend() == "tpu"
            and os.environ.get("GD3D_PAIRWISE_PALLAS") == "1"
        )
        if use_fused:
            from gd3d.kernels.pairwise_rank import pairwise_ranking_sums_fused

            u = (
                kp_feat_all.astype(jnp.float32) @ dh["fusion_in"]["kernel"]
                + dh["fusion_in"]["bias"]
            )
            sums, cnts = pairwise_ranking_sums_fused(
                u,
                dh["fusion_in"]["bias"],
                dh["fusion_ln"]["scale"],
                dh["fusion_ln"]["bias"],
                dh["fusion_out"]["kernel"][:, 0],
                dh["fusion_out"]["bias"],
                kp_depth_all,
                valid_all,
                depth_threshold,
            )

            def view_mean(s, c):
                tot, cnt = jnp.sum(s), jnp.sum(c)
                return jnp.where(cnt > 0, tot / jnp.maximum(cnt, 1.0), 0.0)

            return (view_mean(sums[:B], cnts[:B])
                    + view_mean(sums[B:], cnts[B:])) / 2.0

        from gd3d.ops.losses import pairwise_logistic_ranking_loss

        score_all = self.pairwise_score_diff(params, kp_feat_all)
        intra_1 = pairwise_logistic_ranking_loss(
            score_all[:B], kp_depth_all[:B], depth_threshold, valid_all[:B]
        )
        intra_2 = pairwise_logistic_ranking_loss(
            score_all[B:], kp_depth_all[B:], depth_threshold, valid_all[B:]
        )
        return (intra_1 + intra_2) / 2.0


# --------------------------------------------------------------------------
# Trainable/frozen split: only LoRA, adapters, refine_conv and the depth head
# receive gradients (finetune_timm_mast3r.py:683-689).
# --------------------------------------------------------------------------

TRAINABLE_MARKERS = ("lora_a_", "lora_b_", "adapter", "refine_conv", "depth_diff_head")


def _is_trainable(path: Tuple[str, ...]) -> bool:
    joined = "/".join(str(p) for p in path)
    return any(m in joined for m in TRAINABLE_MARKERS)


def split_params(params: dict) -> Tuple[dict, dict]:
    """Split into (trainable, frozen) trees with identical structure; the
    counterpart leaves are None (use merge_params to reassemble)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)

    def mask(keep_trainable):
        leaves = []
        for path, leaf in flat:
            names = tuple(
                getattr(k, "key", getattr(k, "idx", None)) for k in path
            )
            t = _is_trainable(names)
            leaves.append(leaf if t == keep_trainable else None)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    return mask(True), mask(False)


def merge_params(trainable: dict, frozen: dict) -> dict:
    return jax.tree_util.tree_map(
        lambda a, b: a if a is not None else b,
        trainable,
        frozen,
        is_leaf=lambda x: x is None,
    )
