"""Component-level timing of the full-scale VGGT distillation step.

Hoist-proof methodology (see probe_mast3r_components.py): every piece is
scanned over an (R, ...) stack of DISTINCT inputs inside one dispatch, so
XLA cannot hoist the body, and the ~40 ms/dispatch tunnel overhead is
amortized.

Pieces: teacher extract (1B aggregator bf16 + fp32 camera/DPT heads +
unprojection), sample_keypoints (co-view -> NMS -> track head), student
main pass (6400 tokens at the 640-target geometry), cost pass (/14 grid),
and the REAL train step as the absolute cross-check.

Run: python scripts/probe_vggt_components.py [R]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = 3


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from gd3d.core.config import DistillConfig, LossWeights
    from gd3d.distill import make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.distill.vggt_step import build_vggt_train_step
    from gd3d.models.student import Student, merge_params, split_params
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher

    global R
    if len(sys.argv) > 1:
        R = int(sys.argv[1])

    sd = os.environ.get("GD3D_STUDENT_DTYPE", "bfloat16")
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
    teacher = VggtTeacher(VggtConfig())
    tparams = teacher.init_params(
        jax.random.key(1), hw=(teacher.cfg.img_size,) * 2)

    rng = np.random.RandomState(0)
    V, Rs = 518, 512

    def timed(label, fn, xs, *consts):
        def scanned(xs, *consts):
            def body(c, x):
                out = fn(x, *consts)
                leaves = jax.tree_util.tree_leaves(out)
                acc = sum(
                    l.astype(jnp.float32).reshape(-1)[0] for l in leaves)
                return c + acc, ()

            tot, _ = jax.lax.scan(body, 0.0, xs)
            return tot

        g = jax.jit(scanned)
        out = g(xs, *consts)
        np.asarray(out).reshape(-1)[0]
        t0 = time.perf_counter()
        n = 2
        for _ in range(n):
            out = g(xs, *consts)
        np.asarray(out).reshape(-1)[0]
        dt = (time.perf_counter() - t0) / n / R
        print(f"{label}: {dt * 1e3:.1f} ms", flush=True)

    rv = jnp.asarray(rng.rand(R, 1, 2, V, V, 3), jnp.float32)

    # 1. teacher extract (aggregator + heads + unprojection + cost export)
    # — consume the FULL dict (returning one leaf lets XLA DCE the other
    # heads; the round-2 numbers had that blind spot)
    timed("1. teacher extract_features FULL   ",
          lambda x, tp: teacher.extract_features(
              tp, x, 1.0, dtype="bfloat16"),
          rv, tparams)

    # 1a. aggregator trunk + cost export only (heads DCE'd): apply the
    # model but consume only the attention export
    timed("1a. ... aggregator + cost export    ",
          lambda x, tp: teacher.model.apply(
              {"params": jax.tree_util.tree_map(
                  lambda a: a.astype(jnp.bfloat16)
                  if a.dtype == jnp.float32 else a, tp)},
              x.astype(jnp.bfloat16), temperature=1.0)["attn"],
          rv, tparams)

    # 1b. + depth head (point/camera/track DCE'd)
    timed("1b. ... + depth head                ",
          lambda x, tp: teacher.model.apply(
              {"params": dict(tp, aggregator=jax.tree_util.tree_map(
                  lambda a: a.astype(jnp.bfloat16)
                  if a.dtype == jnp.float32 else a, tp["aggregator"]))},
              x, temperature=1.0)["depth"],
          rv, tparams)

    # 2. extract + sample_keypoints (track head) — the delta vs (1) is the
    # keypoint stage (needs feats + track tokens from the same pass)
    def extract_and_sample(x, tp, key):
        feats, ttok = teacher.extract_features(
            tp, x, 1.0, dtype="bfloat16", return_track_tokens=True)
        kp_1, kp_2, valid, m1, m2 = teacher.sample_keypoints(
            tp, feats, x, key, num_keypoints=kcfg.nms_num,
            min_distance=kcfg.nms_min_distance, border=kcfg.border,
            temperature=1.0, track_tokens=ttok)
        return kp_1

    timed("2. extract + sample_keypoints      ",
          extract_and_sample, rv, tparams, jax.random.key(0))

    # 3. student main pass at the VGGT geometry (512^2 -> 6400 tokens, B=2)
    G = kcfg.nms_num
    sx = {
        "rgb": jnp.asarray(rng.rand(R, 2, V, V, 3), jnp.float32),
        "kps": jnp.asarray(rng.rand(R, 2, G, 2) * (V - 2), jnp.float32),
    }

    def main_pass(x, tr, fz):
        p = merge_params(tr, fz)
        desc, kp_feat = student.get_feature_and_intermediates(
            p, x["rgb"], x["kps"], n=(4, 5, 6, 7))
        return (desc.astype(jnp.float32) ** 2).mean() + (
            kp_feat.astype(jnp.float32) ** 2).mean()

    timed("3. student main pass fwd+bwd (6400) ",
          lambda x, tr, fz: jax.grad(main_pass, argnums=1)(x, tr, fz),
          sx, trainable, frozen)

    def cost_pass(x, tr, fz):
        p = merge_params(tr, fz)
        fc = student.get_feature_cost_vggt(p, x["rgb"], teacher.cfg.patch_size)
        return (fc.astype(jnp.float32) ** 2).mean()

    timed("4. student cost pass fwd+bwd (/14)  ",
          lambda x, tr, fz: jax.grad(cost_pass, argnums=1)(x, tr, fz),
          sx, trainable, frozen)

    # 5. REAL step
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)
    step = build_vggt_train_step(student, teacher, cfg, tx)
    bx = {
        "rgb_1": jnp.asarray(rng.rand(R, 1, Rs, Rs, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(R, 1, Rs, Rs, 3), jnp.float32),
        "rgb_vggt": rv,
    }

    def scanned_step(state, bx, fz, tp):
        def body(s, b):
            s, m = step(s, fz, tp, b, 1.0, jax.random.key(1))
            return s, m["loss"]

        s, losses = jax.lax.scan(body, state, bx)
        return losses.sum()

    g = jax.jit(scanned_step)
    out = g(state, bx, frozen, tparams)
    np.asarray(out).reshape(-1)[0]
    t0 = time.perf_counter()
    n = 2
    for _ in range(n):
        out = g(state, bx, frozen, tparams)
    np.asarray(out).reshape(-1)[0]
    dt = (time.perf_counter() - t0) / n / R
    print(f"5. REAL train step                  : {dt * 1e3:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
