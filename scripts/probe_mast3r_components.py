"""Component budget of the flagship MASt3R distillation step at bench
shapes.

Methodology matters on this host: per-dispatch tunnel overhead is ~40 ms,
so each piece is scanned R times inside ONE dispatch — but the scan must
consume DISTINCT inputs per iteration (xs-scan over an (R, ...) stack), or
XLA hoists the loop-invariant body and computes it once, silently dividing
the reported time by R (this corrupted two earlier probe generations).

Pieces: teacher extract, keypoint pipeline, depth raster, the student's
fused main pass (desc+intermediates), cost pass, pairwise tail — and the
REAL train step (build_mast3r_train_step) as the absolute cross-check
against bench.py.

Run: python scripts/probe_mast3r_components.py [R]
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
    from gd3d.distill import make_optimizer
    from gd3d.distill.keypoints import filter_and_match_keypoints
    from gd3d.distill.mast3r_step import build_mast3r_train_step
    from gd3d.distill.train_state import init_state
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.models.student import Student, merge_params, split_params
    from gd3d.ops.depth import post_process_depth
    from gd3d.ops.geometry import point_cloud_to_depth
    from gd3d.ops.losses import pairwise_logistic_ranking_loss
    from gd3d.teachers.mast3r import Mast3rTeacher

    global R
    if len(sys.argv) > 1:
        R = int(sys.argv[1])

    cfg = DistillConfig(teacher="mast3r", dataset="scannetpp")
    cfg = cfg.replace(student=dataclasses.replace(
        cfg.student, compute_dtype=os.environ.get(
            "GD3D_STUDENT_DTYPE", "bfloat16")))
    kcfg = cfg.keypoints
    H, W = 336, 512
    G = (H // 16) * (W // 16)

    student = Student(cfg.student)
    params0 = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params0)
    teacher = Mast3rTeacher(Mast3rConfig())
    tparams = teacher.init_params(jax.random.key(1), hw=(64, 64))

    rng = np.random.RandomState(0)

    from gd3d.utils.flops import V5E_BF16_PEAK_FLOPS, count_fn_flops

    rows = []  # (label, ms, gflop, mfu_pct) — roofline table

    def timed(label, fn, xs, *consts):
        """fn(x_slice, *consts) scanned over the leading R axis of xs."""

        def scanned(xs, *consts):
            def body(c, x):
                out = fn(x, *consts)
                leaves = jax.tree_util.tree_leaves(out)
                acc = sum(l.astype(jnp.float32).reshape(-1)[0] for l in leaves)
                return c + acc, ()

            tot, _ = jax.lax.scan(body, 0.0, xs)
            return tot

        g = jax.jit(scanned)
        out = g(xs, *consts)
        np.asarray(out).reshape(-1)[0]
        t0 = time.perf_counter()
        n = 3
        for _ in range(n):
            out = g(xs, *consts)
        np.asarray(out).reshape(-1)[0]
        dt = (time.perf_counter() - t0) / n / R
        # analytic matmul/conv FLOPs of ONE call -> per-segment MFU
        try:
            x0 = jax.tree_util.tree_map(lambda a: a[0], xs)
            flops = count_fn_flops(fn, x0, *consts, while_trips=3)
        except Exception as e:
            print(f"  (flop count failed for {label.strip()}: {e!r})",
                  file=sys.stderr)
            flops = float("nan")
        mfu_pct = flops / dt / V5E_BF16_PEAK_FLOPS * 100
        print(f"{label}: {dt * 1e3:6.1f} ms  {flops / 1e9:7.1f} GFLOP  "
              f"MFU {mfu_pct:5.1f}%", flush=True)
        rows.append((label.strip(), dt * 1e3, flops / 1e9, mfu_pct))
        return dt

    # ---- teacher ----
    imgs = {
        "i1": jnp.asarray(rng.rand(R, 1, H, W, 3) * 2 - 1, jnp.float32),
        "i2": jnp.asarray(rng.rand(R, 1, H, W, 3) * 2 - 1, jnp.float32),
    }
    # consume the FULL feature dict: returning only desc_1 lets XLA DCE the
    # second head + the attention export (~the round-2 probe's blind spot)
    timed("teacher extract_features FULL (fp32)   ",
          lambda x, tp: teacher.extract_features(
              tp, x["i1"], x["i2"], 1.0, dtype=None),
          imgs, tparams)
    timed("  ... desc_1 only (head2+attn DCE'd)   ",
          lambda x, tp: teacher.extract_features(
              tp, x["i1"], x["i2"], 1.0, dtype=None)["desc_1"],
          imgs, tparams)

    # ---- keypoint pipeline ----
    feats = {
        "desc_1": jnp.asarray(rng.randn(R, H, W, 24), jnp.float32),
        "desc_2": jnp.asarray(rng.randn(R, H, W, 24), jnp.float32),
        "conf_1": jnp.asarray(rng.rand(R, H, W), jnp.float32),
        "conf_2": jnp.asarray(rng.rand(R, H, W), jnp.float32),
    }
    timed("keypoint pipeline (recip-NN + filters) ",
          lambda f: filter_and_match_keypoints(
              f, H, W, subsample=kcfg.nn_subsample, border=kcfg.border,
              min_conf_percent=kcfg.min_conf_percentile)[0],
          feats)

    # ---- depth raster (one view) ----
    Kmat = jnp.asarray(np.array(
        [[256.0, 0, W / 2], [0, 256.0, H / 2], [0, 0, 1]], np.float32))
    pts = jnp.asarray(rng.rand(R, H * W, 3) * 4 + 0.5, jnp.float32)
    timed("depth raster + postprocess (one view)  ",
          lambda p, k: post_process_depth(
              point_cloud_to_depth(p, k, W, H), kernel_size=3),
          pts, Kmat)

    # ---- student main pass fwd+bwd ----
    sx = {
        "rgb": jnp.asarray(rng.rand(R, 2, H, W, 3), jnp.float32),
        "kps": jnp.asarray(
            rng.rand(R, 2, G, 2) * np.asarray([W - 2, H - 2]), jnp.float32),
    }

    def main_pass_loss(x, tr, fz):
        p = merge_params(tr, fz)
        desc, kp_feat = student.get_feature_and_intermediates(
            p, x["rgb"], x["kps"], n=(4, 5, 6, 7))
        return (desc.astype(jnp.float32) ** 2).mean() + (
            kp_feat.astype(jnp.float32) ** 2).mean()

    timed("student main pass fwd+bwd (4160tok,B=2)",
          lambda x, tr, fz: jax.grad(main_pass_loss, argnums=1)(x, tr, fz),
          sx, trainable, frozen)

    def desc_only_loss(x, tr, fz):
        p = merge_params(tr, fz)
        # n=(4,) but kp_feat unused -> XLA DCEs the intermediate branch;
        # isolates the desc/refine path cost
        desc, _ = student.get_feature_and_intermediates(
            p, x["rgb"], x["kps"], n=(4,))
        return (desc.astype(jnp.float32) ** 2).mean()

    timed("  ... desc branch only (no intermeds)  ",
          lambda x, tr, fz: jax.grad(desc_only_loss, argnums=1)(x, tr, fz),
          sx, trainable, frozen)

    def cost_loss(x, tr, fz):
        p = merge_params(tr, fz)
        fc = student.get_feature_cost(p, x["rgb"], normalize=False)
        return (fc.astype(jnp.float32) ** 2).mean()

    timed("student cost pass fwd+bwd (672tok,B=2) ",
          lambda x, tr, fz: jax.grad(cost_loss, argnums=1)(x, tr, fz),
          sx, trainable, frozen)

    # ---- pairwise tail ----
    px = {
        "feats": jnp.asarray(rng.rand(R, 2, G, cfg.student.embed_dim),
                             jnp.float32),
        "depths": jnp.asarray(rng.rand(R, 2, G), jnp.float32),
        "valid": jnp.asarray(rng.rand(R, 2, G) > 0.3),
    }

    def pair_loss(x, tr, fz):
        p = merge_params(tr, fz)
        score = student.pairwise_score_diff(p, x["feats"])
        return (pairwise_logistic_ranking_loss(
            score[:1], x["depths"][:1], 0.05, x["valid"][:1])
            + pairwise_logistic_ranking_loss(
                score[1:], x["depths"][1:], 0.05, x["valid"][1:])) / 2.0

    timed("pairwise tail fwd+bwd (672^2 x 128)    ",
          lambda x, tr, fz: jax.grad(pair_loss, argnums=1)(x, tr, fz),
          px, trainable, frozen)

    # ---- AP matching loss tail (fwd+bwd wrt descriptors) ----
    from gd3d.ops.losses import ap_loss_paired

    ax = {
        "d1": jnp.asarray(rng.randn(R, 1, G, 768), jnp.float32),
        "d2": jnp.asarray(rng.randn(R, 1, G, 768), jnp.float32),
        "p1": jnp.asarray(rng.rand(R, 1, G, 3), jnp.float32),
        "p2": jnp.asarray(rng.rand(R, 1, G, 3), jnp.float32),
        "v": jnp.asarray(rng.rand(R, 1, G) > 0.3),
    }

    def ap_tail(x):
        def f(d1, d2):
            return ap_loss_paired(
                d1, d2, x["p1"], x["p2"], x["v"],
                thres3d_neg=kcfg.thres3d_neg, temp=kcfg.ap_sigmoid_temp)

        return jax.grad(f, argnums=(0, 1))(x["d1"], x["d2"])

    timed("AP loss tail fwd+bwd (672^2 sims)      ", ap_tail, ax)

    # ---- cost-volume KL tail (einsums + masks + fused kernel, fwd+bwd) ----
    from gd3d.kernels.cost_kl import masked_softmax_kl_rows
    from gd3d.ops.basic import l2_normalize
    from gd3d.ops.masks import masked_patch_cost, patch_mask_from_kps

    kx = {
        "fc": jnp.asarray(rng.randn(R, 2, G, 768), jnp.float32),
        "tc1": jnp.asarray(rng.rand(R, 1, G, G), jnp.float32),
        "tc2": jnp.asarray(rng.rand(R, 1, G, G), jnp.float32),
        "kp1": jnp.asarray(
            rng.rand(R, 1, G, 2) * np.asarray([W - 2, H - 2]), jnp.float32),
        "kp2": jnp.asarray(
            rng.rand(R, 1, G, 2) * np.asarray([W - 2, H - 2]), jnp.float32),
        "v": jnp.asarray(rng.rand(R, 1, G) > 0.3),
    }

    def kl_tail(x):
        def f(fc):
            fc_1 = l2_normalize(fc[:1].reshape(1, G, -1), axis=-1)
            fc_2 = l2_normalize(fc[1:].reshape(1, G, -1), axis=-1)
            cost_12 = jnp.einsum("bnc,bmc->bnm", fc_1, fc_2)
            cost_21 = jnp.einsum("bnc,bmc->bnm", fc_2, fc_1)
            m1 = jax.vmap(
                lambda kp, v: patch_mask_from_kps(kp, H, W, 16, valid=v)
            )(x["kp1"], x["v"])
            m2 = jax.vmap(
                lambda kp, v: patch_mask_from_kps(kp, H, W, 16, valid=v)
            )(x["kp2"], x["v"])
            t1 = jax.vmap(lambda c, m: masked_patch_cost(c[None], m)[0])(
                x["tc1"], m1)
            t2 = jax.vmap(lambda c, m: masked_patch_cost(c[None], m)[0])(
                x["tc2"], m2)
            return (jnp.mean(masked_softmax_kl_rows(t1, cost_12, m1))
                    + jnp.mean(masked_softmax_kl_rows(t2, cost_21, m2))) / 2.0

        return jax.grad(f)(x["fc"])

    timed("cost-KL tail fwd+bwd (masks+einsum+KL) ", kl_tail, kx)

    # ---- kp-depth windows + depth-diff head (fwd+bwd) ----
    from gd3d.ops.geometry import extract_kp_depth

    dx = {
        "d1": jnp.asarray(rng.rand(R, 1, H, W), jnp.float32),
        "d2": jnp.asarray(rng.rand(R, 1, H, W), jnp.float32),
        "kp1": jnp.asarray(
            rng.rand(R, 1, G, 2) * np.asarray([W - 2, H - 2]), jnp.float32),
        "kp2": jnp.asarray(
            rng.rand(R, 1, G, 2) * np.asarray([W - 2, H - 2]), jnp.float32),
        "kf": jnp.asarray(rng.randn(R, 2, G, cfg.student.embed_dim),
                          jnp.float32),
        "v": jnp.asarray(rng.rand(R, 1, G) > 0.3),
    }

    def depth_tail(x, tr, fz):
        def f(tr, kf):
            p = merge_params(tr, fz)
            kd1 = jax.vmap(lambda d, kp: extract_kp_depth(d, kp[None], 3)[0])(
                x["d1"], x["kp1"])
            kd2 = jax.vmap(lambda d, kp: extract_kp_depth(d, kp[None], 3)[0])(
                x["d2"], x["kp2"])
            pred = student.depth_diff(p, kf[:1] - kf[1:])
            gt = jnp.tanh(kd1 - kd2)
            from gd3d.ops.losses import _masked_mean
            return _masked_mean(jnp.abs(pred - gt), x["v"])

        return jax.grad(f, argnums=(0, 1))(tr, x["kf"])

    timed("kp-depth + depth-diff head fwd+bwd     ",
          depth_tail, dx, trainable, frozen)

    # ---- optimizer update (adapter AdamW + clip) ----
    tx_p = make_optimizer(cfg.train)
    state_p = init_state(tx_p, trainable)
    gx = {"g": jnp.asarray(rng.rand(R), jnp.float32)}

    def opt_update(x, st):
        grads = jax.tree_util.tree_map(
            lambda p: p * x["g"], st.trainable)
        updates, opt_state = tx_p.update(grads, st.opt_state, st.trainable)
        return optax.apply_updates(st.trainable, updates)

    import optax

    timed("optimizer update (adapter AdamW + clip)",
          opt_update, gx, state_p)

    # ---- REAL train step (absolute cross-check vs bench.py) ----
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)
    step = build_mast3r_train_step(student, teacher, cfg, tx, has_depth=False)
    bx = {
        "rgb_1": jnp.asarray(rng.rand(R, 1, 512, 512, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(R, 1, 512, 512, 3), jnp.float32),
        "rgb_mast3r_1": jnp.asarray(
            rng.rand(R, 1, H, W, 3) * 2 - 1, jnp.float32),
        "rgb_mast3r_2": jnp.asarray(
            rng.rand(R, 1, H, W, 3) * 2 - 1, jnp.float32),
        "intrinsic": jnp.asarray(np.tile(np.array(
            [[256.0, 0, W / 2], [0, 256.0, H / 2], [0, 0, 1]],
            np.float32), (R, 1, 1, 1))),
    }

    def scanned_step(state, bx, fz, tp):
        def body(s, b):
            s, m = step(s, fz, tp, b, 1.0)
            return s, m["loss"]

        s, losses = jax.lax.scan(body, state, bx)
        return losses.sum()

    g = jax.jit(scanned_step)
    out = g(state, bx, frozen, tparams)
    np.asarray(out).reshape(-1)[0]
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = g(state, bx, frozen, tparams)
    np.asarray(out).reshape(-1)[0]
    dt = (time.perf_counter() - t0) / n / R
    print(f"REAL train step (scan over {R} batches) : {dt * 1e3:.1f} ms",
          flush=True)
    real_ms = dt * 1e3

    # ---- MXU reference peaks: the ATTAINABLE ceilings the roofline
    # compares segments against (measured in the same run, same chip) ----
    mm = {"A": jnp.asarray(rng.randn(R, 4096, 4096), jnp.bfloat16)}
    Bmat = jnp.asarray(rng.randn(4096, 4096), jnp.bfloat16)
    # max-consumption: a sum of scanned dots collapses by distributivity
    # (probe_int8_matmul trap); timed()'s leaf-sum consumption is fine
    # because each iteration's A differs
    timed("PEAK bf16 4096^3 dense matmul          ",
          lambda x, B: jnp.max(jnp.abs(x["A"] @ B)), mm, Bmat)
    mmf = {"A": jnp.asarray(rng.randn(R, 4096, 4096), jnp.float32)}
    timed("PEAK fp32-input default-prec matmul    ",
          lambda x, B: jnp.max(jnp.abs(x["A"] @ B)), mmf,
          jnp.asarray(rng.randn(4096, 4096), jnp.float32))
    # the student's exact attention shape (4160 tokens, 12 heads, D=64,
    # B=2 views), fwd+bwd — the binding kernel of the 61% student segment
    from gd3d.ops.attention import scaled_dot_attention

    N_att = 4160
    ax2 = {"q": jnp.asarray(
        rng.randn(R, 2, N_att, 12, 64), jnp.bfloat16)}
    kv = (jnp.asarray(rng.randn(2, N_att, 12, 64), jnp.bfloat16),
          jnp.asarray(rng.randn(2, N_att, 12, 64), jnp.bfloat16))

    def attn_fwd_bwd(x, k, v):
        def f(q):
            o = scaled_dot_attention(q, k, v)
            return (o.astype(jnp.float32) ** 2).mean()

        return jax.grad(f)(x["q"])

    timed("PEAK flash attn fwd+bwd (2,4160,12,64) ", attn_fwd_bwd, ax2, *kv)
    # the teacher encoder's attention shape (672 tokens, 16 heads, D=64,
    # B=2 images), forward only (frozen teacher)
    ax3 = {"q": jnp.asarray(rng.randn(R, 2, 672, 16, 64), jnp.float32)}
    kv3 = (jnp.asarray(rng.randn(2, 672, 16, 64), jnp.float32),
           jnp.asarray(rng.randn(2, 672, 16, 64), jnp.float32))
    timed("PEAK attn fwd-only teacher (2,672,16,64)",
          lambda x, k, v: scaled_dot_attention(x["q"], k, v), ax3, *kv3)

    print("\n== Roofline table (per segment; MFU = analytic matmul/conv "
          "FLOPs / time / 197 TFLOPS v5e bf16 peak) ==")
    print(f"{'segment':<42} {'ms':>7} {'GFLOP':>9} {'MFU%':>6}")
    for label, ms, gf, m in rows:
        print(f"{label:<42} {ms:7.1f} {gf:9.1f} {m:6.1f}")
    print(f"{'REAL train step':<42} {real_ms:7.1f}")


if __name__ == "__main__":
    main()
