"""Component-level timing of the full-scale VGGT distillation step.

Splits the 861.7 ms/pair step (round-1 measurement) into:
  1. teacher extract_features (aggregator + camera/DPT heads + unprojection)
  2. sample_keypoints (co-view masks -> NMS -> track head -> border)
  3. student forwards + losses + adapter update (teacher feats precomputed)

Run: python scripts/probe_vggt_components.py [iters]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from gd3d.core.config import DistillConfig, LossWeights
    from gd3d.distill import make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.distill.vggt_step import vggt_distill_loss
    from gd3d.models.student import Student, merge_params, split_params
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sd = os.environ.get("GD3D_STUDENT_DTYPE", "bfloat16")
    import dataclasses

    cfg = DistillConfig(
        teacher="vggt", dataset="scannetpp",
        loss_weights=LossWeights(ap=1.0, depth=1.0, intra_depth=1.0, kl=1.0),
        teacher_dtype="bfloat16",
    )
    cfg = cfg.replace(
        student=dataclasses.replace(cfg.student, compute_dtype=sd))
    kcfg = cfg.keypoints

    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params)
    full = merge_params(trainable, frozen)
    teacher = VggtTeacher(VggtConfig())
    # full-res init: the track head's corr pyramid underflows at tiny hw
    tparams = teacher.init_params(
        jax.random.key(1), hw=(teacher.cfg.img_size,) * 2)

    rng = np.random.RandomState(0)
    V, R = 518, 512
    rgb_vggt = jnp.asarray(rng.rand(1, 2, V, V, 3), jnp.float32)
    rgb_1 = jnp.asarray(rng.rand(1, R, R, 3), jnp.float32)
    rgb_2 = jnp.asarray(rng.rand(1, R, R, 3), jnp.float32)
    key = jax.random.key(0)

    def timed(fn, *args, label=""):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") and x.size == 1
            else x, out)
        np.asarray(jax.tree_util.tree_leaves(out)[0])[()]  # sync
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
        dt = (time.perf_counter() - t0) / iters
        print(f"{label}: {dt * 1e3:.1f} ms")
        return out, dt

    extract = jax.jit(
        lambda tp, rv: teacher.extract_features(
            tp, rv, 1.0, dtype="bfloat16", return_track_tokens=True))
    (feats, ttok), t_teacher = timed(
        extract, tparams, rgb_vggt,
        label="1. teacher extract_features   ")

    sample = jax.jit(
        lambda tp, f, tt, rv, k: teacher.sample_keypoints(
            tp, f, rv, k, num_keypoints=kcfg.nms_num,
            min_distance=kcfg.nms_min_distance, border=kcfg.border,
            temperature=1.0, track_tokens=tt))
    kps, t_sample = timed(sample, tparams, feats, ttok, rgb_vggt, key,
                          label="2. sample_keypoints (track head)")

    # student + losses + grads with the teacher part re-run inside one jit
    # is the full step; isolate the student side by differencing instead:
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)

    from gd3d.distill.vggt_step import build_vggt_train_step

    step = jax.jit(build_vggt_train_step(student, teacher, cfg, tx))
    (_, t_full) = timed(
        lambda s, f, tp, b, t, k: step(s, f, tp, b, t, k)[1]["loss"],
        state, frozen, tparams,
        {"rgb_1": rgb_1, "rgb_2": rgb_2, "rgb_vggt": rgb_vggt}, 1.0, key,
        label="4. FULL step                    ")
    print(f"   => student fwd/bwd + losses + opt ~ "
          f"{(t_full - t_teacher - t_sample) * 1e3:.1f} ms (by difference)")


if __name__ == "__main__":
    main()
