"""Fused masked-softmax-KL kernel vs the unfused reference path."""
import jax
import jax.numpy as jnp
import numpy as np

from gd3d.kernels.cost_kl import _reference_rows, masked_softmax_kl_rows
from gd3d.ops.losses import kl_divergence_map
from gd3d.ops.masks import masked_patch_cost


def _data(B=2, N=40, M=40, seed=0):
    rng = np.random.RandomState(seed)
    teacher = np.abs(rng.rand(B, N, M)).astype(np.float32)
    mask = rng.rand(B, N) > 0.3
    cost = (rng.rand(B, N, M).astype(np.float32) - 0.5) * 2
    return jnp.asarray(teacher), jnp.asarray(cost), jnp.asarray(mask)


def test_kernel_matches_unfused_path():
    teacher, cost, mask = _data()
    # unfused: reference composition of masked_patch_cost + kl_divergence_map
    t_norm = jax.vmap(lambda c, m: masked_patch_cost(c[None], m)[0])(
        teacher, mask
    )
    s_soft = jax.vmap(
        lambda c, m: masked_patch_cost(c[None], m, use_softmax=True)[0]
    )(cost, mask)
    want = float(kl_divergence_map(t_norm, s_soft))

    rows = masked_softmax_kl_rows(t_norm, cost, mask, 1e-8, True)
    got = float(jnp.mean(rows))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kernel_matches_jnp_reference_rows():
    teacher, cost, mask = _data(seed=1)
    t_norm = teacher / jnp.maximum(teacher.sum(-1, keepdims=True), 1e-8)
    want = np.asarray(_reference_rows(t_norm, cost, mask, 1e-8))
    got = np.asarray(masked_softmax_kl_rows(t_norm, cost, mask, 1e-8, True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_kernel_row_masked_matches_vggt_chain():
    """The VGGT wiring (kernel rows * row-mask): equals the reference chain
    softmax -> get_masked_patch_cost row-norm -> kl_divergence_map
    (finetune_timm_vggt.py:519-533), in value and gradient."""
    teacher, cost, mask = _data(seed=3)
    # teacher export rows are softmaxed (sum to 1), like the aggregator's
    t_soft = jax.nn.softmax(teacher, axis=-1)
    t_norm = jax.vmap(lambda c, m: masked_patch_cost(c[None], m)[0])(
        t_soft, mask
    )

    def vggt_chain(c):
        s = jax.nn.softmax(c, axis=-1)
        s = jax.vmap(lambda x, m: masked_patch_cost(x[None], m)[0])(s, mask)
        return kl_divergence_map(t_norm, s)

    def fused(c):
        rows = masked_softmax_kl_rows(t_norm, c, mask, 1e-8, True) * mask
        return jnp.mean(rows)

    np.testing.assert_allclose(
        float(fused(cost)), float(vggt_chain(cost)), rtol=1e-5)
    g1 = np.asarray(jax.grad(fused)(cost))
    g2 = np.asarray(jax.grad(vggt_chain)(cost))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-6)


def test_kernel_gradient_matches_autodiff():
    teacher, cost, mask = _data(B=1, N=24, M=32, seed=2)
    t_norm = teacher / jnp.maximum(teacher.sum(-1, keepdims=True), 1e-8)

    def fused(c):
        return jnp.mean(masked_softmax_kl_rows(t_norm, c, mask, 1e-8, True))

    def unfused(c):
        return jnp.mean(_reference_rows(t_norm, c, mask, 1e-8))

    g1 = np.asarray(jax.grad(fused)(cost))
    g2 = np.asarray(jax.grad(unfused)(cost))
    np.testing.assert_allclose(g1, g2, rtol=1e-4, atol=1e-6)


def test_kernel_partitions_over_cpu_mesh():
    """The custom_partitioning wrapper (gd3d/parallel/pallas_partition.py)
    must execute the kernel per-shard on a live 4x2 device mesh with the
    batch dim sharded, matching the single-device result. The flagship
    DP x TP program hits the same wrapper on TPU — Mosaic kernels cannot be
    auto-partitioned by GSPMD/Shardy (found by dryrun_multichip_aot)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gd3d.core.mesh import DATA_AXIS, make_mesh

    teacher, cost, mask = _data(B=8, N=40, M=40, seed=2)
    t_norm = teacher / jnp.maximum(teacher.sum(-1, keepdims=True), 1e-8)
    want = np.asarray(masked_softmax_kl_rows(t_norm, cost, mask, 1e-8, True))

    mesh = make_mesh(n_data=4, n_model=2)
    dp = NamedSharding(mesh, P(DATA_AXIS))
    f = jax.jit(lambda t, c, m: masked_softmax_kl_rows(t, c, m, 1e-8, True),
                in_shardings=(dp, dp, dp))
    got = np.asarray(f(jax.device_put(t_norm, dp), jax.device_put(cost, dp),
                       jax.device_put(mask, dp)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
