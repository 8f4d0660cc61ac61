"""DINOv2-L/14-with-registers patchifier used by the VGGT aggregator.

Parity target: vggt/layers/vision_transformer.py:42-407 — cls token + 4
register tokens, absolute pos embed interpolated bicubically WITH antialias
(interpolate_antialias=True, aggregator.py:156), LayerScale init 1.0, exact
GELU, final LayerNorm; output is x_norm_patchtokens.

Reproduced quirk: interpolate_pos_encoding targets size (w0, h0) — width
first (vision_transformer.py:206-207) — so for non-square inputs the pos
grid is transposed relative to token order exactly like upstream DINOv2.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gd3d.models.vggt.config import VggtConfig
from gd3d.models.vggt.layers import VggtBlock
from gd3d.models.vit import _bicubic_resize_matrix


def _interp_pos_embed(pos_embed: jnp.ndarray, grid_hw, num_prefix: int = 1):
    """pos_embed (1, 1+M*M, C) -> (1, 1+gh*gw, C) with the (w0, h0) quirk."""
    gh, gw = grid_hw
    prefix = pos_embed[:, :num_prefix]
    patch = pos_embed[:, num_prefix:]
    n = patch.shape[1]
    M = int(round(n**0.5))
    if (gh, gw) == (M, M):
        return pos_embed
    grid = patch.reshape(M, M, -1)
    # vision_transformer.py has TWO quirks that cancel: prepare_tokens
    # unpacks `B, nc, w, h = x.shape` (so "w" is really H), and
    # interpolate_pos_encoding sizes to (w0, h0) — net effect: the pos
    # grid is resized to the NORMAL (gh, gw) layout and flattened
    # row-major, aligning with the patch tokens. (Round 3 fix: the
    # round-2 reading applied the size quirk without the unpack quirk,
    # transposing the grid on non-square inputs — caught by the 392x518
    # reference-direct test.)
    Wh = jnp.asarray(_bicubic_resize_matrix(M, gh, antialias=True))
    Ww = jnp.asarray(_bicubic_resize_matrix(M, gw, antialias=True))
    grid = jnp.einsum("oi,ijc->ojc", Wh, grid)
    grid = jnp.einsum("oj,ijc->ioc", Ww, grid)
    return jnp.concatenate([prefix, grid.reshape(1, gh * gw, -1)], axis=1)


class DinoV2(nn.Module):
    """Returns patch tokens after the final LayerNorm: (B, gh*gw, C)."""

    cfg: VggtConfig

    @nn.compact
    def __call__(self, imgs: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        ps = cfg.patch_size
        C = cfg.embed_dim
        B, H, W, _ = imgs.shape
        gh, gw = H // ps, W // ps

        x = nn.Conv(C, (ps, ps), strides=(ps, ps), padding="VALID",
                    name="patch_embed")(imgs)
        x = x.reshape(B, gh * gw, C)

        cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, C))
        n_pos = (cfg.img_size // ps) ** 2 + 1
        pos_embed = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_pos, C)
        )
        reg = self.param(
            "register_tokens", nn.initializers.zeros,
            (1, cfg.num_register_tokens, C),
        )

        x = jnp.concatenate([jnp.tile(cls_token, (B, 1, 1)), x], axis=1)
        x = x + _interp_pos_embed(pos_embed, (gh, gw))
        # registers inserted AFTER pos add (vision_transformer.py:223-233)
        x = jnp.concatenate(
            [x[:, :1], jnp.tile(reg, (B, 1, 1)), x[:, 1:]], axis=1
        )

        Scanned = nn.scan(
            VggtBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=cfg.dino_depth,
            in_axes=nn.broadcast,
            out_axes=0,
        )
        x, _ = Scanned(
            C, cfg.dino_num_heads, mlp_ratio=4.0,
            init_values=cfg.dino_init_values, qk_norm=False,
            use_rope=False, eps=cfg.layernorm_eps, name="blocks",
        )(x)
        x = nn.LayerNorm(epsilon=cfg.layernorm_eps, name="norm")(x)
        return x[:, 1 + cfg.num_register_tokens :]
