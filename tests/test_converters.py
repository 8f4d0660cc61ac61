"""Structural converter tests: fabricate torch-layout state dicts with the
upstream key names/shapes for tiny configs, convert, and APPLY the models —
catches key-path or transpose drift without needing real checkpoints."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gd3d.models.croco import CrocoConfig
from gd3d.models.mast3r import Mast3r, Mast3rConfig
from gd3d.models.vggt.config import VggtConfig
from gd3d.teachers.mast3r import convert_mast3r
from gd3d.teachers.vggt import convert_vggt

TINY_M = Mast3rConfig(
    croco=CrocoConfig(
        patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
    ),
    local_feat_dim=6, dpt_feature_dim=32, dpt_last_dim=16,
)

TINY_V = VggtConfig(
    img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2,
    num_register_tokens=4, dino_depth=2, dino_num_heads=2,
    camera_trunk_depth=1, camera_iterations=1, dpt_features=8,
    dpt_out_channels=(8, 8, 8, 8), dpt_hooks=(0, 0, 1, 1),
    track_features=8, track_iters=1, track_stride=2, corr_levels=2,
    corr_radius=1, track_hidden_size=16, track_depth=2,
    num_virtual_tracks=4,
)


def _rng_state(shapes, seed=0):
    rng = np.random.RandomState(seed)
    return {k: rng.randn(*v).astype(np.float32) * 0.02 for k, v in shapes.items()}


def _linear_keys(prefix, din, dout, bias=True):
    out = {f"{prefix}.weight": (dout, din)}
    if bias:
        out[f"{prefix}.bias"] = (dout,)
    return out


def _ln_keys(prefix, d):
    return {f"{prefix}.weight": (d,), f"{prefix}.bias": (d,)}


def _enc_block_keys(prefix, d):
    keys = {}
    keys.update(_ln_keys(f"{prefix}.norm1", d))
    keys.update(_ln_keys(f"{prefix}.norm2", d))
    keys.update(_linear_keys(f"{prefix}.attn.qkv", d, 3 * d))
    keys.update(_linear_keys(f"{prefix}.attn.proj", d, d))
    keys.update(_linear_keys(f"{prefix}.mlp.fc1", d, 4 * d))
    keys.update(_linear_keys(f"{prefix}.mlp.fc2", 4 * d, d))
    return keys


def _dec_block_keys(prefix, d):
    keys = _enc_block_keys(prefix, d)
    keys.update(_ln_keys(f"{prefix}.norm3", d))
    keys.update(_ln_keys(f"{prefix}.norm_y", d))
    for p in ("projq", "projk", "projv", "proj"):
        keys.update(_linear_keys(f"{prefix}.cross_attn.{p}", d, d))
    return keys


def _dpt_keys(prefix, dims, feat, last, out_ch, in_dims):
    keys = {}
    keys[f"{prefix}.act_postprocess.0.0.weight"] = (dims[0], in_dims[0], 1, 1)
    keys[f"{prefix}.act_postprocess.0.0.bias"] = (dims[0],)
    keys[f"{prefix}.act_postprocess.0.1.weight"] = (dims[0], dims[0], 4, 4)
    keys[f"{prefix}.act_postprocess.0.1.bias"] = (dims[0],)
    keys[f"{prefix}.act_postprocess.1.0.weight"] = (dims[1], in_dims[1], 1, 1)
    keys[f"{prefix}.act_postprocess.1.0.bias"] = (dims[1],)
    keys[f"{prefix}.act_postprocess.1.1.weight"] = (dims[1], dims[1], 2, 2)
    keys[f"{prefix}.act_postprocess.1.1.bias"] = (dims[1],)
    keys[f"{prefix}.act_postprocess.2.0.weight"] = (dims[2], in_dims[2], 1, 1)
    keys[f"{prefix}.act_postprocess.2.0.bias"] = (dims[2],)
    keys[f"{prefix}.act_postprocess.3.0.weight"] = (dims[3], in_dims[3], 1, 1)
    keys[f"{prefix}.act_postprocess.3.0.bias"] = (dims[3],)
    keys[f"{prefix}.act_postprocess.3.1.weight"] = (dims[3], dims[3], 3, 3)
    keys[f"{prefix}.act_postprocess.3.1.bias"] = (dims[3],)
    for i in range(4):
        keys[f"{prefix}.scratch.layer{i + 1}_rn.weight"] = (feat, dims[i], 3, 3)
    for i in range(1, 5):
        for unit in ("resConfUnit1", "resConfUnit2"):
            for conv in ("conv1", "conv2"):
                keys[f"{prefix}.scratch.refinenet{i}.{unit}.{conv}.weight"] = (
                    feat, feat, 3, 3)
                keys[f"{prefix}.scratch.refinenet{i}.{unit}.{conv}.bias"] = (feat,)
        keys[f"{prefix}.scratch.refinenet{i}.out_conv.weight"] = (feat, feat, 1, 1)
        keys[f"{prefix}.scratch.refinenet{i}.out_conv.bias"] = (feat,)
    keys[f"{prefix}.head.0.weight"] = (feat // 2, feat, 3, 3)
    keys[f"{prefix}.head.0.bias"] = (feat // 2,)
    keys[f"{prefix}.head.2.weight"] = (last, feat // 2, 3, 3)
    keys[f"{prefix}.head.2.bias"] = (last,)
    keys[f"{prefix}.head.4.weight"] = (out_ch, last, 1, 1)
    keys[f"{prefix}.head.4.bias"] = (out_ch,)
    return keys


def test_mast3r_converter_structure_and_apply():
    c = TINY_M.croco
    shapes = {
        "patch_embed.proj.weight": (c.enc_embed_dim, 3, 16, 16),
        "patch_embed.proj.bias": (c.enc_embed_dim,),
    }
    shapes.update(_ln_keys("enc_norm", c.enc_embed_dim))
    shapes.update(_ln_keys("dec_norm", c.dec_embed_dim))
    shapes.update(_linear_keys("decoder_embed", c.enc_embed_dim, c.dec_embed_dim))
    for i in range(c.enc_depth):
        shapes.update(_enc_block_keys(f"enc_blocks.{i}", c.enc_embed_dim))
    for i in range(c.dec_depth):
        shapes.update(_dec_block_keys(f"dec_blocks.{i}", c.dec_embed_dim))
        shapes.update(_dec_block_keys(f"dec_blocks2.{i}", c.dec_embed_dim))
    idim = c.enc_embed_dim + c.dec_embed_dim
    nch = (TINY_M.local_feat_dim + 1) * c.patch_size**2
    for h in (1, 2):
        shapes.update(
            _dpt_keys(
                f"downstream_head{h}.dpt", (96, 192, 384, 768),
                TINY_M.dpt_feature_dim, TINY_M.dpt_last_dim, 4,
                (c.enc_embed_dim, c.dec_embed_dim, c.dec_embed_dim,
                 c.dec_embed_dim),
            )
        )
        shapes.update(
            _linear_keys(f"downstream_head{h}.head_local_features.fc1",
                         idim, 4 * idim)
        )
        shapes.update(
            _linear_keys(f"downstream_head{h}.head_local_features.fc2",
                         4 * idim, nch)
        )
    state = _rng_state(shapes)
    converted = convert_mast3r(state, TINY_M)

    model = Mast3r(TINY_M)
    img = jnp.asarray(np.random.RandomState(1).rand(1, 32, 64, 3) * 2 - 1,
                      jnp.float32)
    ref = model.init(jax.random.key(0), img, img)["params"]

    # structural equality of the two trees
    ref_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p): l.shape
        for p, l in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_flatten_with_path(converted)[0]
    }
    assert set(got_paths) == set(ref_paths), (
        set(ref_paths) ^ set(got_paths)
    )
    for k in ref_paths:
        assert tuple(ref_paths[k]) == tuple(got_paths[k]), (
            k, ref_paths[k], got_paths[k]
        )

    out = model.apply({"params": converted}, img, img, 1.0)
    assert np.isfinite(np.asarray(out["res1"]["pts3d"])).all()


def test_vggt_converter_structure():
    cfg = TINY_V
    d = cfg.embed_dim
    shapes = {
        "aggregator.camera_token": (1, 2, 1, d),
        "aggregator.register_token": (1, 2, cfg.num_register_tokens, d),
        "aggregator.patch_embed.cls_token": (1, 1, d),
        "aggregator.patch_embed.pos_embed": (
            1, (cfg.img_size // cfg.patch_size) ** 2 + 1, d),
        "aggregator.patch_embed.register_tokens": (
            1, cfg.num_register_tokens, d),
        "aggregator.patch_embed.patch_embed.proj.weight": (d, 3, 14, 14),
        "aggregator.patch_embed.patch_embed.proj.bias": (d,),
    }
    shapes.update(_ln_keys("aggregator.patch_embed.norm", d))

    def ls_block(prefix, qk):
        keys = _enc_block_keys(prefix, d)
        keys[f"{prefix}.ls1.gamma"] = (d,)
        keys[f"{prefix}.ls2.gamma"] = (d,)
        if qk:
            hd = d // cfg.num_heads
            keys.update(_ln_keys(f"{prefix}.attn.q_norm", hd))
            keys.update(_ln_keys(f"{prefix}.attn.k_norm", hd))
        return keys

    for i in range(cfg.dino_depth):
        shapes.update(ls_block(f"aggregator.patch_embed.blocks.{i}", False))
    for i in range(cfg.depth):
        shapes.update(ls_block(f"aggregator.frame_blocks.{i}", True))
        shapes.update(ls_block(f"aggregator.global_blocks.{i}", True))

    state = _rng_state(shapes, seed=2)
    converted = convert_vggt(state, cfg)

    from gd3d.models.vggt.aggregator import Aggregator

    agg = Aggregator(cfg)
    imgs = jnp.asarray(np.random.RandomState(3).rand(1, 2, 28, 28, 3),
                       jnp.float32)
    ref = agg.init(jax.random.key(0), imgs)["params"]
    ref_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p): l.shape
        for p, l in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_paths = {
        "/".join(str(getattr(k, "key", k)) for k in p): np.shape(l)
        for p, l in jax.tree_util.tree_flatten_with_path(
            converted["aggregator"])[0]
    }
    # converted tree must be a subtree of the model's aggregator params
    ref_agg = {k: v for k, v in ref_paths.items()}
    for k, shp in got_paths.items():
        assert k in ref_agg, k
        assert tuple(ref_agg[k]) == tuple(shp), (k, ref_agg[k], shp)

    out_tokens, attn = agg.apply(
        {"params": _merge(ref, converted["aggregator"])}, imgs
    )
    assert np.isfinite(np.asarray(attn)).all()


def _merge(full, overlay):
    import copy

    out = copy.deepcopy(jax.device_get(full))

    def rec(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                rec(dst[k], v)
            else:
                dst[k] = v

    rec(out, overlay)
    return out
