"""Frozen MASt3R teacher: inference wrapper + torch checkpoint converter.

extract_features() reproduces extract_mast3r_features
(src/finetune_timm_mast3r.py:345-389) including the symmetrized-batch
indexing: for each pair, "element 1" of the reference batch is the
img1->img2 direction and "element 0" the img2->img1 direction.
"""
from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from gd3d.models.mast3r import Mast3r, Mast3rConfig
from gd3d.teachers.convert import _conv, _layernorm, _linear


class Mast3rTeacher:
    def __init__(self, cfg: Mast3rConfig = Mast3rConfig()):
        self.cfg = cfg
        self.model = Mast3r(cfg)

    def init_params(self, rng: jax.Array, hw=(64, 64)) -> dict:
        dummy = jnp.zeros((1, hw[0], hw[1], 3), jnp.float32)
        # jit: eager flax init dispatches thousands of tiny ops — through
        # the device tunnel (~40 ms each) that is minutes for ViT-L
        return jax.jit(self.model.init)(rng, dummy, dummy)["params"]

    def extract_features(
        self,
        params: dict,
        rgb_mast3r_1: jnp.ndarray,
        rgb_mast3r_2: jnp.ndarray,
        temperature: jnp.ndarray | float = 1.0,
        dtype: str | None = None,
    ) -> Dict[str, jnp.ndarray]:
        """Frozen symmetric inference. Images (B, H, W, 3) in [-1, 1], W>=H.

        dtype='bfloat16' runs the encoder/decoder trunk in bf16 while the
        heads stay fp32 via dtype promotion — the analogue of the
        reference's autocast-off head block (dust3r/dust3r/model.py:339-341).

        Returns per-pair tensors shaped (B, H, W, ...) / (B, N, N):
          desc_1/2, pts3d_1, pts3d_2_from_1, pts3d_2, conf_1/2, cost_1/2 —
        the exact set the distillation step consumes
        (finetune_timm_mast3r.py:377-389).
        """
        B = rgb_mast3r_1.shape[0]
        if dtype == "bfloat16":
            bf = jnp.bfloat16

            def cast(tree):
                return jax.tree_util.tree_map(
                    lambda x: x.astype(bf) if x.dtype == jnp.float32 else x,
                    tree,
                )

            params = dict(params)
            for key in ("encoder", "decoder_embed", "dec_pairs", "dec_norm"):
                if key in params:
                    params[key] = cast(params[key])
            rgb_mast3r_1 = rgb_mast3r_1.astype(bf)
            rgb_mast3r_2 = rgb_mast3r_2.astype(bf)
        out = self.model.apply(
            {"params": params}, rgb_mast3r_1, rgb_mast3r_2, temperature
        )
        out = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x,
            out,
        )
        res1, res2 = out["res1"], out["res2"]
        feats = {
            "desc_1": res1["desc"][B:],
            "desc_2": res2["desc"][B:],
            "pts3d_1": res1["pts3d"][B:],
            "pts3d_2_from_1": res2["pts3d_in_other_view"][B:],
            "pts3d_2": res1["pts3d"][:B],
            "conf_1": res1["conf"][B:],
            "conf_2": res1["conf"][:B],
            "cost_1": res2["tgt_attn_map"][B:],
            "cost_2": res2["tgt_attn_map"][:B],
        }
        return jax.tree_util.tree_map(jax.lax.stop_gradient, feats)


# ---------------------------------------------------------------------------
# torch -> flax converter for naver/MASt3R_* checkpoints
# ---------------------------------------------------------------------------

def _decoder_block(state: Mapping, p: str) -> dict:
    return {
        "norm1": _layernorm(state, f"{p}.norm1"),
        "norm2": _layernorm(state, f"{p}.norm2"),
        "norm3": _layernorm(state, f"{p}.norm3"),
        "norm_y": _layernorm(state, f"{p}.norm_y"),
        "attn": {
            "qkv": _linear(state, f"{p}.attn.qkv"),
            "proj": _linear(state, f"{p}.attn.proj"),
        },
        "cross_attn": {
            "projq": _linear(state, f"{p}.cross_attn.projq"),
            "projk": _linear(state, f"{p}.cross_attn.projk"),
            "projv": _linear(state, f"{p}.cross_attn.projv"),
            "proj": _linear(state, f"{p}.cross_attn.proj"),
        },
        "mlp": {
            "fc1": _linear(state, f"{p}.mlp.fc1"),
            "fc2": _linear(state, f"{p}.mlp.fc2"),
        },
    }


def _enc_block(state: Mapping, p: str) -> dict:
    return {
        "norm1": _layernorm(state, f"{p}.norm1"),
        "norm2": _layernorm(state, f"{p}.norm2"),
        "attn": {
            "qkv": _linear(state, f"{p}.attn.qkv"),
            "proj": _linear(state, f"{p}.attn.proj"),
        },
        "mlp": {
            "fc1": _linear(state, f"{p}.mlp.fc1"),
            "fc2": _linear(state, f"{p}.mlp.fc2"),
        },
    }


def _conv_transpose(state: Mapping, prefix: str) -> dict:
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    # kernel (kh, kw, in, out), spatially flipped (torch's transposed conv is
    # the gradient of a conv; flax applies the kernel unflipped).
    w = np.asarray(state[f"{prefix}.weight"])
    k = w.transpose(2, 3, 0, 1)[::-1, ::-1]
    out = {"kernel": np.ascontiguousarray(k)}
    if f"{prefix}.bias" in state:
        out["bias"] = np.asarray(state[f"{prefix}.bias"])
    return out


def _dpt_tree(state: Mapping, p: str) -> dict:
    tree = {
        "act_0_proj": _conv(state, f"{p}.act_postprocess.0.0"),
        "act_0_up": _conv_transpose(state, f"{p}.act_postprocess.0.1"),
        "act_1_proj": _conv(state, f"{p}.act_postprocess.1.0"),
        "act_1_up": _conv_transpose(state, f"{p}.act_postprocess.1.1"),
        "act_2_proj": _conv(state, f"{p}.act_postprocess.2.0"),
        "act_3_proj": _conv(state, f"{p}.act_postprocess.3.0"),
        "act_3_down": _conv(state, f"{p}.act_postprocess.3.1"),
        "head_0": _conv(state, f"{p}.head.0"),
        "head_2": _conv(state, f"{p}.head.2"),
        "head_4": _conv(state, f"{p}.head.4"),
    }
    for i in range(4):
        tree[f"layer_{i}_rn"] = _conv(state, f"{p}.scratch.layer{i + 1}_rn")
    for i in range(1, 5):
        rp = f"{p}.scratch.refinenet{i}"
        blk = {
            "resConfUnit2": {
                "conv1": _conv(state, f"{rp}.resConfUnit2.conv1"),
                "conv2": _conv(state, f"{rp}.resConfUnit2.conv2"),
            },
            "out_conv": _conv(state, f"{rp}.out_conv"),
        }
        if i != 4:
            # refinenet4 is called without a skip input (dpt_head.py:57), so
            # its resConfUnit1 weights are dead upstream — not materialized
            # in the flax tree.
            blk["resConfUnit1"] = {
                "conv1": _conv(state, f"{rp}.resConfUnit1.conv1"),
                "conv2": _conv(state, f"{rp}.resConfUnit1.conv2"),
            }
        tree[f"refinenet{i}"] = blk
    return tree


def convert_mast3r(state: Mapping, cfg: Mast3rConfig = Mast3rConfig()) -> dict:
    """Convert an AsymmetricMASt3R torch state_dict to the gd3d param tree
    (nn.scan weight-stacked blocks: encoder/enc_blocks, dec_pairs/blk1|blk2)."""
    from gd3d.teachers.convert import _stack_trees

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
    }
    # dec_blocks2 duplicated from dec_blocks when absent (model.py:169-176)
    have2 = any(k.startswith("dec_blocks2.") for k in state)
    params["dec_pairs"] = {
        "blk1": _stack_trees(
            [_decoder_block(state, f"dec_blocks.{i}") for i in range(c.dec_depth)]
        ),
        "blk2": _stack_trees(
            [
                _decoder_block(
                    state, f"dec_blocks2.{i}" if have2 else f"dec_blocks.{i}"
                )
                for i in range(c.dec_depth)
            ]
        ),
    }
    for hid, hname in ((1, "head1"), (2, "head2")):
        hp = f"downstream_head{hid}"
        params[hname] = {
            "dpt": _dpt_tree(state, f"{hp}.dpt"),
            "lf_fc1": _linear(state, f"{hp}.head_local_features.fc1"),
            "lf_fc2": _linear(state, f"{hp}.head_local_features.fc2"),
        }
    return params
