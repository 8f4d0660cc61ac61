"""Isolate the student fwd+bwd cost inside the MASt3R step at bench shapes.

Times (a) the fused get_feature_and_intermediates pass (4160-token grid),
(b) the get_feature_cost pass (672 tokens), (c) the pairwise-ranking tail,
each as value_and_grad w.r.t. the trainable params, scanned R times inside
one dispatch to amortize the ~40 ms tunnel overhead.

Run: python scripts/probe_student.py [R]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

R = 4


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from gd3d.core.config import DistillConfig
    from gd3d.models.student import Student, merge_params, split_params
    from gd3d.ops.losses import pairwise_logistic_ranking_loss

    global R
    if len(sys.argv) > 1:
        R = int(sys.argv[1])

    sd = os.environ.get("GD3D_STUDENT_DTYPE", "bfloat16")
    cfg = DistillConfig(teacher="mast3r", dataset="scannetpp")
    cfg = cfg.replace(student=dataclasses.replace(cfg.student, compute_dtype=sd))
    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params)

    rng = np.random.RandomState(0)
    H, W = 336, 512
    G = (H // 16) * (W // 16)  # 672 kp slots
    rgb = jnp.asarray(rng.rand(2, H, W, 3), jnp.float32)  # 2 views stacked
    kps = jnp.asarray(rng.rand(2, G, 2) * np.asarray([W - 2, H - 2]),
                      jnp.float32)
    depths = jnp.asarray(rng.rand(2, G), jnp.float32)
    valid = jnp.asarray(rng.rand(2, G) > 0.3)

    def timed(label, loss_fn):
        # frozen/data must be ARGS, not closure constants — closed-over
        # arrays get serialized into the HLO and blow the tunnel's
        # remote-compile body limit
        def scanned(tr, fz, *data):
            # grad of the scanned sum == R * grad of one (same per-iter cost)
            def body(c, _):
                return c + loss_fn(tr, fz, *data), ()

            tot, _ = jax.lax.scan(body, 0.0, None, length=R)
            return tot

        g = jax.jit(jax.grad(scanned))

        def run():
            return g(trainable, frozen, rgb, kps, depths, valid)

        out = run()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = run()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).reshape(-1)[0]
        dt = (time.perf_counter() - t0) / n / R
        print(f"{label}: {dt * 1e3:.1f} ms per fwd+bwd", flush=True)

    feats_pair = jnp.asarray(rng.rand(2, G, cfg.student.embed_dim),
                             jnp.float32)

    def loss_inter(tr, fz, rgb, kps, depths, valid):
        p = merge_params(tr, fz)
        desc, kp_feat = student.get_feature_and_intermediates(
            p, rgb, kps, n=(4, 5, 6, 7))
        return (desc.astype(jnp.float32) ** 2).mean() + (
            kp_feat.astype(jnp.float32) ** 2).mean()

    timed("get_feature_and_intermediates (4160 tok, B=2)", loss_inter)

    def loss_cost(tr, fz, rgb, kps, depths, valid):
        p = merge_params(tr, fz)
        fc = student.get_feature_cost(p, rgb, normalize=False)
        return (fc.astype(jnp.float32) ** 2).mean()

    timed("get_feature_cost (672 tok, B=2)              ", loss_cost)

    def loss_pair(tr, fz, rgb, kps, depths, valid):
        p = merge_params(tr, fz)
        score = student.pairwise_score_diff(p, feats_pair)
        return (
            pairwise_logistic_ranking_loss(score[:1], depths[:1], 0.05,
                                           valid[:1])
            + pairwise_logistic_ranking_loss(score[1:], depths[1:], 0.05,
                                             valid[1:])
        ) / 2.0

    timed("pairwise_score_diff + ranking (672^2)        ", loss_pair)


if __name__ == "__main__":
    main()
