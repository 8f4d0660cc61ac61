"""CroCo pretraining (masked cross-view completion) tests.

Reference targets: dust3r/croco/models/croco.py:137-256 (masked forward),
masking.py:12-25 (RandomMask), criterion.py:14-37 (MaskedMSE),
dust3r/dust3r/model.py:169-176 (CroCo-checkpoint trunk load).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gd3d.models.croco import CrocoConfig
from gd3d.models.croco_pretrain import (
    CrocoPretrain,
    croco_to_dust3r,
    masked_mse,
    random_mask,
)

TINY = CrocoConfig(
    patch_size=16, enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
    dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
)


def _imgs(seed, B=2, hw=64):
    r = np.random.RandomState(seed)
    return (
        jnp.asarray(r.rand(B, hw, hw, 3) * 2 - 1, jnp.float32),
        jnp.asarray(r.rand(B, hw, hw, 3) * 2 - 1, jnp.float32),
    )


def test_random_mask_exact_count():
    m = random_mask(jax.random.key(0), 4, 16, 0.9)
    assert m.shape == (4, 16) and m.dtype == jnp.bool_
    # RandomMask masks exactly int(0.9 * 16) = 14 per row (masking.py:20)
    assert np.all(np.asarray(m.sum(axis=1)) == 14)
    # different rows differ (iid noise)
    m2 = random_mask(jax.random.key(1), 4, 16, 0.9)
    assert not np.array_equal(np.asarray(m), np.asarray(m2))


def test_masked_mse_matches_formula():
    r = np.random.RandomState(0)
    pred = jnp.asarray(r.rand(2, 16, 12), jnp.float32)
    target = jnp.asarray(r.rand(2, 16, 12), jnp.float32)
    mask = jnp.asarray(r.rand(2, 16) < 0.5)
    per = ((np.asarray(pred) - np.asarray(target)) ** 2).mean(-1)
    want = (per * np.asarray(mask)).sum() / np.asarray(mask).sum()
    got = float(masked_mse(pred, mask, target))
    assert abs(got - want) < 1e-6
    # norm_pix_loss branch (criterion.py:27-31)
    t = np.asarray(target)
    tn = (t - t.mean(-1, keepdims=True)) / (
        t.var(-1, keepdims=True) + 1e-6) ** 0.5
    want_n = (((np.asarray(pred) - tn) ** 2).mean(-1)
              * np.asarray(mask)).sum() / np.asarray(mask).sum()
    got_n = float(masked_mse(pred, mask, target, norm_pix_loss=True))
    assert abs(got_n - want_n) < 1e-5


def test_forward_shapes_and_target():
    img1, img2 = _imgs(0)
    model = CrocoPretrain(TINY, mask_ratio=0.9)
    mask = random_mask(jax.random.key(1), 2, 16, 0.9)
    params = model.init(jax.random.key(0), img1, img2, mask)["params"]
    pred, target = model.apply({"params": params}, img1, img2, mask)
    assert pred.shape == (2, 16, 16 * 16 * 3)
    assert target.shape == pred.shape
    # patchify raster order (p, q, c): patch (r, c) of the target equals
    # the image crop (croco.py:212-225)
    t = np.asarray(target).reshape(2, 4, 4, 16, 16, 3)
    crop = np.asarray(img1)[0, 16:32, 32:48]
    assert np.allclose(t[0, 1, 2], crop)


def test_mask_actually_hides_tokens():
    """Changing a MASKED patch of img1 must not change the visible-token
    encoding — predictions move only through the decoder's canvas (the
    masked token content never reaches the network)."""
    img1, img2 = _imgs(1)
    model = CrocoPretrain(TINY, mask_ratio=0.9)
    mask = random_mask(jax.random.key(2), 2, 16, 0.9)
    params = model.init(jax.random.key(0), img1, img2, mask)["params"]
    pred1, _ = model.apply({"params": params}, img1, img2, mask)
    # perturb one masked patch (find a masked index of row 0)
    midx = int(np.nonzero(np.asarray(mask)[0])[0][0])
    r, c = divmod(midx, 4)
    img1_p = img1.at[0, r * 16:(r + 1) * 16, c * 16:(c + 1) * 16].add(0.37)
    pred2, _ = model.apply({"params": params}, img1_p, img2, mask)
    assert np.allclose(np.asarray(pred1), np.asarray(pred2), atol=1e-6)


def test_croco_to_dust3r_layout_accepted_by_mast3r():
    """The remapped trunk drops into the Mast3r param tree (the reference's
    CroCo-checkpoint load, model.py:169-176) and changes the forward."""
    from gd3d.models.mast3r import Mast3r, Mast3rConfig

    img1, img2 = _imgs(2)
    pre = CrocoPretrain(TINY, mask_ratio=0.9)
    mask = random_mask(jax.random.key(0), 2, 16, 0.9)
    pre_params = pre.init(jax.random.key(7), img1, img2, mask)["params"]

    mcfg = Mast3rConfig(croco=TINY, local_feat_dim=6, dpt_feature_dim=32,
                        dpt_last_dim=16)
    model = Mast3r(mcfg)
    params = model.init(jax.random.key(0), img1, img2)["params"]
    trunk = croco_to_dust3r(pre_params)
    out_before = model.apply({"params": params}, img1, img2)
    for k, v in trunk.items():
        if k == "encoder":
            params["encoder"].update(v)
        else:
            params[k] = v
    out = model.apply({"params": params}, img1, img2)
    assert out["res1"]["pts3d"].shape == out_before["res1"]["pts3d"].shape
    assert not np.allclose(np.asarray(out["res1"]["pts3d"]),
                           np.asarray(out_before["res1"]["pts3d"]))


def test_pretrain_step_learns():
    import optax

    from gd3d.distill.pretrain import build_croco_pretrain_step

    img1, img2 = _imgs(3)
    model = CrocoPretrain(TINY, mask_ratio=0.9)
    mask = random_mask(jax.random.key(0), 2, 16, 0.9)
    batch = {"img1": img1, "img2": img2, "mask1": mask}
    params = model.init(jax.random.key(0), img1, img2, mask)["params"]
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    step = build_croco_pretrain_step(model, tx)
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_pretrain_step_dp_mesh_matches_single_device():
    """DP over the 8-device CPU mesh reproduces the single-device croco
    step (params replicated, batch + mask sharded on `data`)."""
    import optax

    from gd3d.core.mesh import make_mesh, replicated, shard_batch
    from gd3d.distill.pretrain import build_croco_pretrain_step

    img1, img2 = _imgs(4, B=8)
    model = CrocoPretrain(TINY, mask_ratio=0.9)
    mask = random_mask(jax.random.key(3), 8, 16, 0.9)
    batch = {"img1": img1, "img2": img2, "mask1": mask}
    params = model.init(jax.random.key(0), img1, img2, mask)["params"]
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    p1, _, m1 = build_croco_pretrain_step(model, tx)(
        jax.tree_util.tree_map(jnp.copy, params),
        tx.init(params), batch)

    mesh = make_mesh()
    params_r = jax.device_put(params, replicated(mesh))
    opt_r = jax.device_put(opt_state, replicated(mesh))
    step = build_croco_pretrain_step(model, tx, mesh=mesh)
    p2, _, m2 = step(params_r, opt_r, shard_batch(mesh, batch))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-5
    a = jax.tree_util.tree_leaves(p1)
    b = jax.tree_util.tree_leaves(p2)
    for x, y in zip(a, b):
        # reduction-order noise through adamw's rsqrt (same as the mast3r
        # mesh test): measured max 2e-4 abs / 0.34% rel on 1 of 24k elements
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-2, atol=3e-4)


def test_croco_pretrain_cli_smoke(tmp_path):
    from gd3d.cli.pretrain import main

    main(["--output", str(tmp_path / "run"), "--objective", "croco",
          "--steps", "2", "--tiny", "--batch", "2", "--cpu",
          "--export-dust3r"])
    assert (tmp_path / "run" / "params_final.npz").exists()
    assert (tmp_path / "run" / "dust3r_trunk.npz").exists()
    lines = (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2


def test_croco_to_mast3r_handoff_cli(tmp_path):
    """The full pretraining lifecycle: croco stage -> exported dust3r trunk
    -> mast3r stage initialized from it (the reference's CroCo-checkpoint
    load, dust3r/model.py:169-176). The trunk leaves of the initialized run
    must START from the exported values (heads fresh)."""
    from flax.traverse_util import flatten_dict

    from gd3d.cli.pretrain import _load_npz_tree, _merge_trunk, main

    main(["--output", str(tmp_path / "croco"), "--objective", "croco",
          "--steps", "1", "--tiny", "--batch", "1", "--cpu",
          "--export-dust3r"])
    trunk_path = tmp_path / "croco" / "dust3r_trunk.npz"
    main(["--output", str(tmp_path / "m"), "--objective", "mast3r",
          "--steps", "1", "--tiny", "--batch", "1", "--cpu",
          "--init-trunk", str(trunk_path)])
    assert (tmp_path / "m" / "params_final.npz").exists()

    # _merge_trunk really overwrites every trunk leaf (and only those)
    trunk = _load_npz_tree(trunk_path)
    fake = {k: np.zeros_like(v) for k, v in flatten_dict(trunk).items()}
    from flax.traverse_util import unflatten_dict

    model_params = _load_npz_tree(tmp_path / "m" / "params_final.npz")
    merged = _merge_trunk(model_params, unflatten_dict(fake))
    mflat = flatten_dict(merged)
    for k in fake:
        assert not np.any(mflat[k])

    # shape mismatch fails loudly, pointing at the config
    bad = {("decoder_embed", "kernel"): np.zeros((3, 3), np.float32)}
    with pytest.raises(SystemExit, match="shape mismatch"):
        _merge_trunk(model_params, unflatten_dict(bad))


# ------------------------------------------------------- reference-direct
@pytest.mark.slow
def test_reference_croco_pretrain_forward_matches():
    """The ACTUAL CroCoNet from /root/reference (RoPE100, tiny dims,
    random weights) vs CrocoPretrain with converted weights: pred, target,
    and the MaskedMSE criterion value, with the reference's own mask."""
    import sys
    import types

    import torch

    if "timm" not in sys.modules:
        sys.modules["timm"] = types.ModuleType("timm")
    for p in ("/root/reference/dust3r", "/root/reference/dust3r/croco"):
        if p not in sys.path:
            sys.path.append(p)
    from models.criterion import MaskedMSE
    from models.croco import CroCoNet

    from gd3d.models.croco_pretrain import convert_croco_pretrain

    torch.manual_seed(0)
    ref = CroCoNet(
        img_size=64, patch_size=16, mask_ratio=0.9,
        enc_embed_dim=32, enc_depth=2, enc_num_heads=2,
        dec_embed_dim=16, dec_depth=2, dec_num_heads=2,
        pos_embed="RoPE100",
    ).eval()

    r = np.random.RandomState(5)
    img1 = r.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    img2 = r.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    with torch.no_grad():
        # CroCoNet.forward is DEAD CODE in the reference: its fork of
        # DecoderBlock returns (x, y, attn_map) (blocks.py:189-195) while
        # the pretraining _decoder still unpacks two values (croco.py:206)
        # and raises. Drive the same semantics manually with the
        # fork-compatible 3-tuple unpack (croco.py:174-256).
        t1, t2 = torch.from_numpy(img1), torch.from_numpy(img2)
        feat1, pos1, mask = ref._encode_image(t1, do_mask=True)
        feat2, pos2, _ = ref._encode_image(t2, do_mask=False)
        visf1 = ref.decoder_embed(feat1)
        f2 = ref.decoder_embed(feat2)
        B, Nenc, C = visf1.shape
        f1_ = ref.mask_token.repeat(B, mask.shape[1], 1)
        f1_[~mask] = visf1.view(B * Nenc, C)
        out, out2 = f1_, f2
        for blk in ref.dec_blocks:
            out, out2, _ = blk(out, out2, pos1, pos2)
        out = ref.prediction_head(ref.dec_norm(out))
        target = ref.patchify(t1)
        ref_loss = MaskedMSE(norm_pix_loss=False)(out, mask, target)

    cfg = CrocoConfig(patch_size=16, enc_embed_dim=32, enc_depth=2,
                      enc_num_heads=2, dec_embed_dim=16, dec_depth=2,
                      dec_num_heads=2)
    params = convert_croco_pretrain(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    model = CrocoPretrain(cfg, mask_ratio=0.9)
    j1 = jnp.asarray(img1.transpose(0, 2, 3, 1))
    j2 = jnp.asarray(img2.transpose(0, 2, 3, 1))
    jmask = jnp.asarray(mask.numpy())
    pred, tgt = model.apply({"params": params}, j1, j2, jmask)

    np.testing.assert_allclose(np.asarray(tgt), target.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pred), out.numpy(),
                               atol=2e-4, rtol=1e-4)
    loss = float(masked_mse(pred, jmask, tgt))
    assert abs(loss - float(ref_loss)) < 1e-5
