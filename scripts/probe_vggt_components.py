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
     GD3D_PROBE=tails  -> only the loss/optimizer tails + the depth-head
                          full-res conv tail (cheap compiles; the heavy
                          teacher/student pieces are skipped)
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

    mode = os.environ.get("GD3D_PROBE", "all")
    if mode == "tails":
        _probe_tails(jax, jnp, timed, student, teacher, trainable, frozen,
                     cfg, kcfg, rng, V)
        return

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

    _probe_tails(jax, jnp, timed, student, teacher, trainable, frozen,
                 cfg, kcfg, rng, V)


def _probe_tails(jax, jnp, timed, student, teacher, trainable, frozen,
                 cfg, kcfg, rng, V):
    """Loss/optimizer tails + the depth-head full-res conv tail.

    Closes the remaining mass of the VGGT budget (the round-2/early-round-3
    probes covered teacher/keypoints/student passes only), and bounds the
    VERDICT-named 'sparse-tap depth head' lever: the depth map feeds the
    DENSE co-view reprojection masks via unprojection
    (finetune_timm_vggt.py:376-378 -> get_coview_masks), so only the final
    conv tail's isolated cost is even in play for a gather variant.
    """
    import flax.linen as nn

    from gd3d.models.dpt import resize_bilinear_ac
    from gd3d.models.student import merge_params
    from gd3d.ops.geometry import extract_kp_depth
    from gd3d.ops.losses import _masked_mean, ap_loss_paired, kl_divergence_map
    from gd3d.ops.basic import l2_normalize
    from gd3d.ops.masks import masked_patch_cost
    from gd3d.distill import make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.distill.vggt_step import _nearest_downsample_mask

    B, G, C = 1, kcfg.nms_num, 768
    phw = V // teacher.cfg.patch_size
    hw = phw * phw

    # 6a. kp-depth windows + depth-diff head + L1 (grads to head params)
    dx = {
        "depth_1": jnp.asarray(rng.rand(R, B, V, V), jnp.float32),
        "depth_2": jnp.asarray(rng.rand(R, B, V, V), jnp.float32),
        "kp_1": jnp.asarray(rng.rand(R, B, G, 2) * (V - 2), jnp.float32),
        "kp_2": jnp.asarray(rng.rand(R, B, G, 2) * (V - 2), jnp.float32),
        "kpf": jnp.asarray(rng.rand(R, 2 * B, G, C), jnp.float32),
        "valid": jnp.asarray(rng.rand(R, B, G) > 0.3),
    }

    def depth_tail(x, tr, fz):
        def f(tr2, kpf):
            p = merge_params(tr2, fz)
            kd1 = jax.vmap(lambda d, kp: extract_kp_depth(
                d, kp[None], kcfg.depth_window)[0])(x["depth_1"], x["kp_1"])
            kd2 = jax.vmap(lambda d, kp: extract_kp_depth(
                d, kp[None], kcfg.depth_window)[0])(x["depth_2"], x["kp_2"])
            pred = student.depth_diff(p, kpf[:B] - kpf[B:])
            gt = jnp.tanh(kd1 - kd2)
            return _masked_mean(jnp.abs(pred - gt), x["valid"])

        return jax.grad(f, argnums=(0, 1))(tr, x["kpf"])

    timed("6a. depth windows + diff-head tail  ", depth_tail, dx,
          trainable, frozen)

    # 6b. intra-depth pairwise tail (G^2 x 128 per view, fwd+bwd)
    def intra_tail(x, tr, fz):
        def f(tr2, kpf):
            p = merge_params(tr2, fz)
            kd = jnp.concatenate(
                [jax.vmap(lambda d, kp: extract_kp_depth(
                    d, kp[None], 3)[0])(x["depth_1"], x["kp_1"]),
                 jax.vmap(lambda d, kp: extract_kp_depth(
                     d, kp[None], 3)[0])(x["depth_2"], x["kp_2"])], axis=0)
            v = jnp.concatenate([x["valid"], x["valid"]], axis=0)
            return student.intra_depth_loss(
                p, kpf, kd, v, kcfg.depth_rank_threshold)

        return jax.grad(f, argnums=(0, 1))(tr, x["kpf"])

    timed("6b. intra-depth pairwise tail       ", intra_tail, dx,
          trainable, frozen)

    # 6c. cost-KL tail: l2norm + (hw, hw) einsum + softmax + rownorm + KL,
    # fwd+bwd to the student cost features (the cost-pass probe consumed
    # fc directly, so this chain was the unprobed remainder)
    cx = {
        "fc": jnp.asarray(rng.rand(R, 2 * B, hw, C), jnp.float32),
        "tcost_1": jnp.asarray(rng.rand(R, B, hw, hw), jnp.float32),
        "tcost_2": jnp.asarray(rng.rand(R, B, hw, hw), jnp.float32),
        "mask_1": jnp.asarray(rng.rand(R, B, V, V) > 0.4),
        "mask_2": jnp.asarray(rng.rand(R, B, V, V) > 0.4),
    }

    def kl_tail(x, _tr, _fz):
        def f(fc_all):
            fc_1 = l2_normalize(fc_all[:B].reshape(B, hw, -1), axis=-1)
            fc_2 = l2_normalize(fc_all[B:].reshape(B, hw, -1), axis=-1)
            c12 = jax.nn.softmax(
                jnp.einsum("bnc,bmc->bnm", fc_1, fc_2), axis=-1)
            c21 = jax.nn.softmax(
                jnp.einsum("bnc,bmc->bnm", fc_2, fc_1), axis=-1)
            mp_1 = jax.vmap(lambda m: _nearest_downsample_mask(
                m, phw, phw).reshape(-1))(x["mask_1"])
            mp_2 = jax.vmap(lambda m: _nearest_downsample_mask(
                m, phw, phw).reshape(-1))(x["mask_2"])

            def rownorm(c, m):
                return masked_patch_cost(c[None], m)[0]

            return (kl_divergence_map(jax.vmap(rownorm)(x["tcost_1"], mp_1),
                                      jax.vmap(rownorm)(c12, mp_1))
                    + kl_divergence_map(jax.vmap(rownorm)(x["tcost_2"], mp_2),
                                        jax.vmap(rownorm)(c21, mp_2))) / 2.0

        return jax.grad(f)(x["fc"])

    timed("6c. cost einsum + KL tail (unfused) ", kl_tail, cx,
          trainable, frozen)

    # 6c'. the round-3 wiring: fused Pallas masked-softmax-KL kernel
    # (kernel rows * row-mask; see vggt_step.py)
    from gd3d.kernels.cost_kl import masked_softmax_kl_rows

    def kl_tail_fused(x, _tr, _fz):
        def f(fc_all):
            fc_1 = l2_normalize(fc_all[:B].reshape(B, hw, -1), axis=-1)
            fc_2 = l2_normalize(fc_all[B:].reshape(B, hw, -1), axis=-1)
            c12 = jnp.einsum("bnc,bmc->bnm", fc_1, fc_2)
            c21 = jnp.einsum("bnc,bmc->bnm", fc_2, fc_1)
            mp_1 = jax.vmap(lambda m: _nearest_downsample_mask(
                m, phw, phw).reshape(-1))(x["mask_1"])
            mp_2 = jax.vmap(lambda m: _nearest_downsample_mask(
                m, phw, phw).reshape(-1))(x["mask_2"])

            def rownorm(c, m):
                return masked_patch_cost(c[None], m)[0]

            t_1 = jax.vmap(rownorm)(x["tcost_1"], mp_1)
            t_2 = jax.vmap(rownorm)(x["tcost_2"], mp_2)
            r1 = masked_softmax_kl_rows(t_1, c12, mp_1) * mp_1
            r2 = masked_softmax_kl_rows(t_2, c21, mp_2) * mp_2
            return (jnp.mean(r1) + jnp.mean(r2)) / 2.0

        return jax.grad(f)(x["fc"])

    timed("6c'. cost einsum + KL tail (fused)  ", kl_tail_fused, cx,
          trainable, frozen)

    # 6d. AP tail (G x G sims + smooth-AP, fwd+bwd to descs)
    ax = {
        "desc": jnp.asarray(rng.rand(R, 2 * B, G, C), jnp.float32),
        "pts": jnp.asarray(rng.rand(R, 2 * B, G, 3), jnp.float32),
        "valid": dx["valid"],
    }

    def ap_tail(x, _tr, _fz):
        def f(desc):
            return ap_loss_paired(
                desc[:B], desc[B:], x["pts"][:B], x["pts"][B:], x["valid"],
                thres3d_neg=kcfg.thres3d_neg, temp=kcfg.ap_sigmoid_temp)

        return jax.grad(f)(x["desc"])

    timed("6d. AP loss tail                    ", ap_tail, ax,
          trainable, frozen)

    # 6e. optimizer update (adapter AdamW + clip) on the trainable pytree
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)
    gx = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.rand(R, *a.shape).astype(np.float32) * 1e-3), trainable)

    def opt_tail(g, st):
        updates, _ = tx.update(g, st.opt_state, st.trainable)
        import optax
        return optax.apply_updates(st.trainable, updates)

    timed("6e. optimizer update                ", opt_tail, gx, state)

    # 6f. depth-head full-res conv tail, isolated (per DPT head: the
    # refinenet1 output -> output_conv1 (3x3 256->128 @ 4x grid) -> bilinear
    # to 518^2 -> conv 3x3 128->32 -> conv 1x1 ->4; runs for BOTH DPT heads)
    class _Tail(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(128, (3, 3), padding="SAME", name="c1")(x)
            x = resize_bilinear_ac(x, (V, V))
            x = nn.Conv(32, (3, 3), padding="SAME", name="c2")(x)
            x = nn.relu(x)
            return nn.Conv(4, (1, 1), name="c3")(x)

    tailm = _Tail()
    g4 = phw * 4
    tp0 = tailm.init(jax.random.key(2), jnp.zeros((2, g4, g4, 256)))
    tin = jnp.asarray(rng.rand(R, 2, g4, g4, 256), jnp.float32)
    timed("6f. DPT full-res conv tail (1 head) ",
          lambda x, p: tailm.apply(p, x), tin, tp0)


if __name__ == "__main__":
    main()
