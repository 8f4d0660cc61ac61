"""bf16 student compute policy (StudentConfig.compute_dtype).

The TPU analogue of the reference's AMP autocast on the trainable side
(/root/reference/src/finetune_timm_mast3r.py:758): matmuls/convs in bf16 on
the MXU, fp32 master params, fp32 LayerNorms/residual stream/losses. These
tests pin (a) params and outputs stay fp32, (b) the bf16 forward tracks the
fp32 forward closely, (c) a full ME train step's loss moves by <1% — the
PCK-affecting-numerics guard VERDICT.md item 3 asks for.
"""
import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gd3d.core.config import DistillConfig, StudentConfig
from gd3d.data.synthetic import synthetic_me_batch
from gd3d.distill import build_me_train_step, make_optimizer
from gd3d.distill.train_state import init_state
from gd3d.models.student import Student, split_params

TINY = dict(
    embed_dim=64,
    depth=4,
    num_heads=2,
    patch_size=8,
    pretrain_img_size=32,
    lora_start_block=2,
    use_adapters=True,
    adapter_bottleneck=8,
    target_res=64,
    depth_head_hidden=16,
)


def _forward(compute_dtype, params=None, bf16_stream=False):
    cfg = StudentConfig(**TINY, compute_dtype=compute_dtype,
                        bf16_stream=bf16_stream)
    student = Student(cfg)
    if params is None:
        params = student.init(jax.random.key(0), img_size=32)
    rng = np.random.RandomState(0)
    rgbs = jnp.asarray(rng.rand(1, 48, 64, 3), jnp.float32)
    pts = jnp.asarray(rng.rand(1, 16, 2) * np.array([60.0, 44.0]), jnp.float32)
    feat = student.get_feature(params, rgbs, pts, normalize=True)
    return params, feat


def test_bf16_params_stay_fp32_and_outputs_fp32():
    cfg = StudentConfig(**TINY, compute_dtype="bfloat16")
    student = Student(cfg)
    params = student.init(jax.random.key(0), img_size=32)
    dtypes = {
        str(leaf.dtype) for leaf in jax.tree_util.tree_leaves(params)
    }
    assert dtypes == {"float32"}, f"master params must be fp32, got {dtypes}"
    _, feat = _forward("bfloat16", params)
    assert feat.dtype == jnp.float32


def test_bf16_forward_tracks_fp32():
    params, f32 = _forward("float32")
    _, bf16 = _forward("bfloat16", params)
    # features are L2-normalized; bf16 matmul noise should stay small
    err = float(jnp.abs(f32 - bf16).max())
    assert err < 5e-2, f"bf16 feature drift {err}"
    cos = float(jnp.mean(jnp.sum(f32 * bf16, -1)))
    assert cos > 0.999, f"bf16 feature cosine {cos}"


def test_bf16_stream_tracks_fp32_and_outputs_fp32():
    """bf16 residual stream (StudentConfig.bf16_stream): torch-autocast
    keeps residual adds in half precision; outputs must still be fp32 and
    track the fp32 forward."""
    params, f32 = _forward("float32")
    _, bf16 = _forward("bfloat16", params, bf16_stream=True)
    assert bf16.dtype == jnp.float32
    err = float(jnp.abs(f32 - bf16).max())
    assert err < 8e-2, f"bf16-stream feature drift {err}"
    cos = float(jnp.mean(jnp.sum(f32 * bf16, -1)))
    assert cos > 0.998, f"bf16-stream feature cosine {cos}"


def _me_step_loss(compute_dtype):
    cfg = DistillConfig(
        teacher="me",
        dataset="synthetic",
        student=StudentConfig(
            **{**TINY, "lora_start_block": 0, "target_res": 32},
            compute_dtype=compute_dtype,
        ),
    )
    student = Student(cfg.student, me_interp_quirk=True)
    params = student.init(jax.random.key(0), img_size=32)
    trainable, frozen = split_params(params)
    tx = make_optimizer(cfg.train)
    step = jax.jit(build_me_train_step(student, cfg, tx))
    state = init_state(tx, trainable)
    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_me_batch(0, batch=2, img=32, n_kps=16).items()
    }
    _, metrics = step(state, frozen, batch)
    return float(metrics["loss"])


@pytest.mark.slow
def test_bf16_me_train_step_loss_delta():
    l32 = _me_step_loss("float32")
    l16 = _me_step_loss("bfloat16")
    assert np.isfinite(l16)
    rel = abs(l16 - l32) / max(abs(l32), 1e-6)
    assert rel < 0.01, f"bf16 loss delta {rel:.4f} (fp32 {l32}, bf16 {l16})"


def test_student_dtype_property_reads_student_config():
    cfg = DistillConfig(
        student=StudentConfig(**TINY, compute_dtype="bfloat16")
    )
    assert cfg.student_dtype == "bfloat16"
    assert dataclasses.asdict(cfg.student)["compute_dtype"] == "bfloat16"
