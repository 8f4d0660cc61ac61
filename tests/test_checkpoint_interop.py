"""Reference Lightning checkpoint interop: fabricate a .ckpt with the
reference's on_save_checkpoint layout (finetune_timm_mast3r.py:172-191),
load + import it, and verify the adapter weights land in the right slots."""
import pytest
import jax
import numpy as np
import torch

from gd3d.core.checkpoint import (
    export_reference_layout,
    import_reference_layout,
    load_reference_checkpoint,
)
from gd3d.core.config import StudentConfig
from gd3d.models.student import Student, split_params

CFG = StudentConfig(
    embed_dim=32, depth=4, num_heads=2, patch_size=16,
    pretrain_img_size=32, lora_start_block=2, use_adapters=True,
    adapter_bottleneck=8, target_res=64, depth_head_hidden=16,
)


@pytest.mark.slow
def test_lightning_checkpoint_roundtrip(tmp_path):
    student = Student(CFG)
    params = student.init(jax.random.key(0), img_size=32)
    trainable, _ = split_params(params)

    rng = np.random.RandomState(0)
    r, C, hid = CFG.lora_rank, CFG.embed_dim, CFG.depth_head_hidden

    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32))

    n_lora = CFG.depth - CFG.lora_start_block
    ckpt = {"state_dict": {"refine_conv": {"weight": t(C, C, 3, 3),
                                           "bias": t(C)}}}
    for k in range(2 * n_lora):
        # the real reference saves w_As[i].weight as TRAINABLE Parameters
        # (requires_grad=True) — .numpy() without detach raises on these
        ckpt[f"w_a_{k:03d}"] = torch.nn.Parameter(t(r, C))
        ckpt[f"w_b_{k:03d}"] = torch.nn.Parameter(t(C, r))
    for k in range(n_lora):
        ckpt[f"adapter_{k:03d}"] = {
            "down.weight": t(CFG.adapter_bottleneck, C),
            "up.weight": t(C, CFG.adapter_bottleneck),
        }
    ckpt["depth_diff_head"] = {
        "depth_attention.0.weight": t(hid, 1),
        "depth_attention.0.bias": t(hid),
        "depth_attention.2.weight": t(C, hid),
        "depth_attention.2.bias": t(C),
        "fusion_layer.0.weight": t(hid, C),
        "fusion_layer.0.bias": t(hid),
        "fusion_layer.1.weight": t(hid),
        "fusion_layer.1.bias": t(hid),
        "fusion_layer.3.weight": t(1, hid),
        "fusion_layer.3.bias": t(1),
    }
    path = tmp_path / "last.ckpt"
    torch.save(ckpt, path)

    flat = load_reference_checkpoint(str(path))
    assert "w_a_000" in flat and "refine_conv.weight" in flat
    assert "depth_diff_head.fusion_layer.0.weight" in flat
    assert "adapter_000.down.weight" in flat

    imported = import_reference_layout(
        jax.device_get(trainable), flat, CFG
    )
    # exporting again reproduces the torch tensors exactly
    flat2 = export_reference_layout(imported, CFG)
    for k in ("w_a_000", "w_b_001", "refine_conv.weight",
              "adapter_001.up.weight",
              "depth_diff_head.fusion_layer.0.weight"):
        np.testing.assert_allclose(flat2[k], flat[k], rtol=1e-6)

    # the imported weights actually change model outputs
    from gd3d.models.student import merge_params

    _, frozen = split_params(params)
    import jax.numpy as jnp

    rgb = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    pts = jnp.asarray(np.random.RandomState(2).rand(1, 5, 2) * 60, jnp.float32)
    before = student.get_feature(params, rgb, pts)
    after = student.get_feature(merge_params(imported, frozen), rgb, pts)
    assert not np.allclose(np.asarray(before), np.asarray(after))
