"""DPT output adapter for the DUSt3R/MASt3R pixelwise heads.

Parity targets: dust3r/croco/models/dpt_block.py (DPTOutputAdapter :264-,
make_scratch :20, FeatureFusionBlock_custom :144, ResidualConvUnit :81) with
the dust3r fix (dust3r/dust3r/heads/dpt_head.py:20-66): deduplicated
act_postprocess weights and the path_4 crop to layer_3's spatial size.

NHWC throughout; the x2 upsamples are bilinear with align_corners=True like
torch's, implemented as static separable interpolation matrices (MXU-friendly
matmuls instead of gathers).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def _linear_matrix_align_corners(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) bilinear interp matrix, align_corners=True semantics."""
    W = np.zeros((out_size, in_size), np.float32)
    if in_size == 1:
        W[:, 0] = 1.0
        return W
    scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    for o in range(out_size):
        src = o * scale
        f = int(np.floor(src))
        t = src - f
        f2 = min(f + 1, in_size - 1)
        W[o, f] += 1.0 - t
        W[o, f2] += t
    return W


def resize_bilinear_ac(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True (static shapes)."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    if (oh, ow) == (H, W):
        return x
    Mh = jnp.asarray(_linear_matrix_align_corners(H, oh))
    Mw = jnp.asarray(_linear_matrix_align_corners(W, ow))
    x = jnp.einsum("oh,bhwc->bowc", Mh, x)
    return jnp.einsum("pw,bhwc->bhpc", Mw, x)


class ResidualConvUnit(nn.Module):
    """dpt_block.py:81-142 (no BN variant): relu-conv-relu-conv + skip."""

    features: int

    @nn.compact
    def __call__(self, x):
        out = nn.relu(x)
        out = nn.Conv(self.features, (3, 3), padding="SAME", name="conv1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding="SAME", name="conv2")(out)
        return out + x


class FeatureFusionBlock(nn.Module):
    """dpt_block.py:144-218: optional skip-merge, res unit, x2 up, 1x1 out."""

    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, name="resConfUnit2")(x)
        B, H, W, C = x.shape
        x = resize_bilinear_ac(x, (2 * H, 2 * W))
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DustDPT(nn.Module):
    """The dust3r DPT: 4 token taps -> multiscale pyramid -> fused regression.

    __call__(layers: 4x (B, N, C_i) tokens, grid_hw) -> (B, H, W, out_ch)
    where H = grid_h * patch_size (full image resolution).

    Geometry (dpt_head.py:96-116): hooks [0, l/2, 3l/4, l] with dims
    (enc_dim, dec_dim, dec_dim, dec_dim); act postprocess scales x4, x2, x1,
    /2; feature_dim 256; regression head conv3-up2-conv3-relu-conv1.
    """

    layer_dims: Sequence[int] = (96, 192, 384, 768)
    feature_dim: int = 256
    last_dim: int = 128
    out_channels: int = 4

    @nn.compact
    def __call__(self, layers, grid_hw):
        gh, gw = grid_hw
        assert len(layers) == 4
        grids = [l.reshape(l.shape[0], gh, gw, l.shape[-1]) for l in layers]

        # act_postprocess (dpt_block.py:347-413)
        l0 = nn.Conv(self.layer_dims[0], (1, 1), name="act_0_proj")(grids[0])
        l0 = nn.ConvTranspose(
            self.layer_dims[0], (4, 4), strides=(4, 4), padding="VALID",
            name="act_0_up",
        )(l0)
        l1 = nn.Conv(self.layer_dims[1], (1, 1), name="act_1_proj")(grids[1])
        l1 = nn.ConvTranspose(
            self.layer_dims[1], (2, 2), strides=(2, 2), padding="VALID",
            name="act_1_up",
        )(l1)
        l2 = nn.Conv(self.layer_dims[2], (1, 1), name="act_2_proj")(grids[2])
        l3 = nn.Conv(self.layer_dims[3], (1, 1), name="act_3_proj")(grids[3])
        # torch Conv2d(3, stride=2, padding=1) pads (1, 1); flax SAME would
        # pad (0, 1) for even sizes — keep torch's windows explicitly
        l3 = nn.Conv(
            self.layer_dims[3], (3, 3), strides=(2, 2),
            padding=((1, 1), (1, 1)), name="act_3_down",
        )(l3)

        # scratch.layer_rn: 3x3 no-bias projections to feature_dim
        rn = [
            nn.Conv(
                self.feature_dim, (3, 3), padding="SAME", use_bias=False,
                name=f"layer_{i}_rn",
            )(l)
            for i, l in enumerate([l0, l1, l2, l3])
        ]

        # refinenets 4..1 with the dust3r path_4 crop (dpt_head.py:57)
        path4 = FeatureFusionBlock(self.feature_dim, name="refinenet4")(rn[3])
        path4 = path4[:, : rn[2].shape[1], : rn[2].shape[2]]
        path3 = FeatureFusionBlock(self.feature_dim, name="refinenet3")(path4, rn[2])
        path2 = FeatureFusionBlock(self.feature_dim, name="refinenet2")(path3, rn[1])
        path1 = FeatureFusionBlock(self.feature_dim, name="refinenet1")(path2, rn[0])

        # regression head (dpt_block.py:316-322)
        x = nn.Conv(self.feature_dim // 2, (3, 3), padding="SAME", name="head_0")(
            path1
        )
        B, H, W, C = x.shape
        x = resize_bilinear_ac(x, (2 * H, 2 * W))
        x = nn.Conv(self.last_dim, (3, 3), padding="SAME", name="head_2")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_channels, (1, 1), name="head_4")(x)
