"""End-to-end ME training slice: jitted step, DP sharding on a CPU mesh,
frozen/trainable separation, reference checkpoint layout roundtrip."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gd3d.core.checkpoint import export_reference_layout, import_reference_layout
from gd3d.core.config import DistillConfig, StudentConfig
from gd3d.core.mesh import make_mesh, shard_batch
from gd3d.data.synthetic import synthetic_me_batch
from gd3d.distill import build_me_train_step, make_optimizer
from gd3d.distill.train_state import init_state
from gd3d.models.student import Student, split_params

CFG = DistillConfig(
    teacher="me",
    dataset="synthetic",
    student=StudentConfig(
        embed_dim=32,
        depth=4,
        num_heads=2,
        patch_size=8,
        pretrain_img_size=32,
        lora_start_block=2,
        use_adapters=False,
        adapter_bottleneck=8,
        target_res=64,
        depth_head_hidden=16,
    ),
)


def setup():
    student = Student(CFG.student, me_interp_quirk=True)
    params = student.init(jax.random.key(0), img_size=32)
    trainable, frozen = split_params(params)
    tx = make_optimizer(CFG.train)
    step_fn = build_me_train_step(student, CFG, tx)
    state = init_state(tx, trainable)
    return student, state, frozen, step_fn


def _to_jnp(batch):
    return {k: jnp.asarray(v) for k, v in batch.items()}


@pytest.mark.slow
def test_me_train_step_runs_and_updates_only_trainable():
    _, state, frozen, step_fn = setup()
    step_jit = jax.jit(step_fn)
    batch = _to_jnp(synthetic_me_batch(0, batch=1, img=64, n_kps=64))

    before_t = jax.tree_util.tree_leaves(state.trainable)
    state2, metrics = step_jit(state, frozen, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) > 0

    after_t = jax.tree_util.tree_leaves(state2.trainable)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before_t, after_t)
    )
    assert changed, "trainable params did not update"

    # a second step with a different batch also works (same compilation)
    batch2 = _to_jnp(synthetic_me_batch(1, batch=1, img=64, n_kps=64))
    state3, metrics2 = step_jit(state2, frozen, batch2)
    assert np.isfinite(float(metrics2["loss"]))
    assert int(state3.step) == 2


@pytest.mark.slow
def test_me_train_step_data_parallel_mesh():
    """DP over the 8-device CPU mesh: batch sharded, state replicated."""
    _, state, frozen, step_fn = setup()
    mesh = make_mesh()
    assert mesh.devices.size == 8

    repl = NamedSharding(mesh, P())
    state = jax.device_put(state, repl)
    frozen = jax.device_put(frozen, repl)
    batch = shard_batch(mesh, _to_jnp(synthetic_me_batch(2, batch=8, img=64, n_kps=32)))

    step_jit = jax.jit(
        step_fn,
        in_shardings=(repl, repl, NamedSharding(mesh, P("data"))),
        out_shardings=(repl, repl),
    )
    state2, metrics = step_jit(state, frozen, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_reference_checkpoint_layout_roundtrip():
    student, state, frozen, _ = setup()
    flat = export_reference_layout(state.trainable, CFG.student)
    # LoRA keys for blocks 2..3 => w_a_000..003; torch layout (r, dim)
    assert set(k for k in flat if k.startswith("w_a_")) == {
        "w_a_000", "w_a_001", "w_a_002", "w_a_003"
    }
    assert flat["w_a_000"].shape == (4, 32)
    assert flat["refine_conv.weight"].shape == (32, 32, 3, 3)

    # roundtrip: perturb, import, export again
    flat2 = {k: v + 1.0 for k, v in flat.items()}
    imported = import_reference_layout(state.trainable, flat2, CFG.student)
    flat3 = export_reference_layout(imported, CFG.student)
    for k in flat:
        np.testing.assert_allclose(flat3[k], flat2[k], rtol=1e-6)
