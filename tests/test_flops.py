"""Jaxpr FLOP counter: hand-computable cases + scan trip-count handling."""
import jax
import jax.numpy as jnp
import numpy as np

from gd3d.utils.flops import count_fn_flops


def test_matmul_flops():
    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 32))
    got = count_fn_flops(lambda a, b: a @ b, a, b)
    assert got == 2 * 64 * 128 * 32


def test_batched_einsum_flops():
    a = jnp.zeros((4, 10, 16))
    b = jnp.zeros((4, 16, 8))
    got = count_fn_flops(lambda a, b: jnp.einsum("bik,bkj->bij", a, b), a, b)
    assert got == 2 * 4 * 10 * 16 * 8


def test_conv_flops():
    x = jnp.zeros((1, 8, 8, 3))
    k = jnp.zeros((3, 3, 3, 16))
    got = count_fn_flops(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        x, k)
    assert got == 2 * (1 * 8 * 8) * 16 * (3 * 3) * 3


def test_scan_multiplies_by_length():
    a = jnp.zeros((32, 32))

    def layer(x, _):
        return x @ x, None

    def fn(x):
        y, _ = jax.lax.scan(layer, x, None, length=7)
        return y

    got = count_fn_flops(fn, a)
    assert got == 7 * 2 * 32 * 32 * 32


def test_grad_counts_backward_flops():
    a = jnp.zeros((16, 16))
    w = jnp.zeros((16, 16))

    def loss(w):
        return jnp.sum(a @ w)

    fwd = count_fn_flops(loss, w)
    both = count_fn_flops(jax.grad(loss), w)
    # backward of one matmul adds at least one more matmul
    assert both >= 2 * fwd - 1


def test_me_train_step_flops_scale():
    """The tiny ME step's counted FLOPs are in a sane absolute range and
    scan-over-layers is included (>= depth * per-layer matmuls)."""
    from gd3d.core.config import DistillConfig, StudentConfig
    from gd3d.data.synthetic import synthetic_me_batch
    from gd3d.distill import build_me_train_step, make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.models.student import Student, split_params

    cfg = DistillConfig(
        teacher="me", dataset="synthetic",
        student=StudentConfig(
            embed_dim=32, depth=4, num_heads=2, patch_size=8,
            pretrain_img_size=32, lora_start_block=0, use_adapters=False,
            target_res=32, depth_head_hidden=16,
        ),
    )
    student = Student(cfg.student, me_interp_quirk=True)
    params = student.init(jax.random.key(0), img_size=32)
    trainable, frozen = split_params(params)
    tx = make_optimizer(cfg.train)
    step = build_me_train_step(student, cfg, tx)
    state = init_state(tx, trainable)
    batch = {k: jnp.asarray(v) for k, v in
             synthetic_me_batch(0, batch=1, img=32, n_kps=8).items()}
    flops = count_fn_flops(step, state, frozen, batch)
    assert 1e6 < flops < 1e12, flops


def test_pallas_flash_attention_counted():
    """pallas_call kernels must contribute body-FLOPs x grid size; the flash
    q@k^T + attn@v matmuls are the student/teacher hot path."""
    from gd3d.ops.attention import _flash_sdpa

    B, N, H, D = 1, 1024, 4, 64
    q = jnp.zeros((B, N, H, D), jnp.bfloat16)
    got = count_fn_flops(lambda q, k, v: _flash_sdpa(q, k, v, 0.125), q, q, q)
    expect = 2 * 2 * B * H * N * N * D  # qk + av
    assert got >= expect, (got, expect)
    assert got <= 2.0 * expect, (got, expect)
