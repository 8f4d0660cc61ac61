"""Probe: FULL-SCALE VGGT distillation train step on the real chip.

The complete production step (finetune_timm_vggt.py:577-704 analogue):
frozen VGGT-1B teacher extract + co-view NMS keypoint sampling, ViT-B/16
CLIP student forwards, AP/depth/KL losses, adapter-only AdamW — one jitted
program, bf16 teacher trunk (the reference runs VGGT under bf16 autocast,
finetune_timm_vggt.py:115). Random teacher weights (no checkpoint in this
image) — identical FLOP/memory profile to the real ones.

Run:  python scripts/probe_vggt_step_full.py [n_iters]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from gd3d.core.config import DistillConfig
    from gd3d.distill import make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.distill.vggt_step import build_vggt_train_step
    from gd3d.models.student import Student, split_params
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = DistillConfig(teacher="vggt", dataset="scannetpp")

    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params)
    teacher = VggtTeacher(VggtConfig())
    print("initializing full VGGT params on device ...", flush=True)
    tparams = teacher.init_params(jax.random.key(1),
                                  hw=(teacher.cfg.img_size,) * 2)
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)
    step = jax.jit(build_vggt_train_step(student, teacher, cfg, tx))

    rng = np.random.RandomState(0)
    V = teacher.cfg.img_size
    batch = {
        "rgb_1": jnp.asarray(rng.rand(1, 512, 512, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(1, 512, 512, 3), jnp.float32),
        "rgb_vggt": jnp.asarray(rng.rand(1, 2, V, V, 3), jnp.float32),
    }
    key = jax.random.key(0)

    t0 = time.perf_counter()
    state, metrics = step(state, frozen, tparams, batch, 10.0, key)
    loss = float(metrics["loss"])  # hard sync through the tunnel
    print(f"compile+first: {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, frozen, tparams, batch, 10.0, key)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"vggt_full_distill_step: {dt * 1e3:.1f} ms/pair "
          f"({1.0 / dt:.2f} pairs/s)", flush=True)
    for k, v in metrics.items():
        print(f"  {k}: {float(np.asarray(v).reshape(-1)[-1]):.4f}")


if __name__ == "__main__":
    main()
