"""Benchmark: flagship MASt3R-distillation step throughput on the real chip.

Prints one JSON line per metric on stdout; the flagship MASt3R metric is
printed FIRST (so a driver timeout can never lose it), the VGGT 1B-teacher
step metric second (default-on — regression-guarded round over round), and
the MASt3R line is then RE-printed so it is also the LAST stdout line
(the contract driver parsers rely on). Diagnostics (MFU, FLOP estimates)
go to stderr.

The step matches FinetuneMASt3RTIMM.training_step at ScanNet++ geometry
(512x336 teacher frames, 512^2 student frames): frozen MASt3R ViT-L
symmetric inference with cost-volume export, on-device reciprocal-NN
keypoint pipeline, fused student forwards (ViT-B at effective stride 8;
the reference's 6 passes batched into 2) + the three distillation losses +
adapter-only AdamW update, K=32 optimizer steps per XLA dispatch
(lax.scan; measured 4.72 pairs/s vs 4.69 at K=16).

Timing is the MEDIAN of GD3D_BENCH_REPS (default 5) dispatches after one
warmup; every rep + min/max goes to stderr and a contention-suspect flag
is emitted when warmup >> steady-state or max > 2x min (the round-4
single-dispatch record was corrupted 3x by ambient tunnel congestion).

vs_baseline is the ratio against the PHYSICALLY ATTAINABLE per-chip target
(BASELINE.md "north star renegotiated": 5.0 pairs/s/chip for the
parity-precision step, 5.2 for the all-bf16 envelope, 2.0 for the VGGT 1B
step — derived from the measured ~11.2 TFLOP/pair against the 197 bf16
TFLOPS v5e ceiling; the original 2,000 pairs/s/chip ask exceeds the chip's
speed of light by >100x and is kept as the secondary vs_north_star_2000
field). Three metrics are emitted: flagship parity-config MASt3R, VGGT,
and the all-bf16 MASt3R envelope (GD3D_BENCH_ENV=0 skips the third).

Precision policy (env-overridable):
  GD3D_BENCH_STUDENT_DTYPE  default bfloat16 — the reference trains the
                            student under AMP (finetune_timm_mast3r.py:758);
                            fp32 master params + losses either way.
  GD3D_BENCH_TEACHER_DTYPE  default float32 — the reference runs MASt3R fp32.
  GD3D_BENCH_VGGT=0         skip the VGGT distillation step (on by default).
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

NORTH_STAR_PAIRS_PER_SEC = 2000.0  # BASELINE.json's original ask (see above)
# attainable per-chip targets (BASELINE.md derivation, round-4)
TARGET_MAST3R = 5.0       # parity precision (fp32 teacher, bf16 student)
TARGET_MAST3R_ENV = 5.2   # all-bf16 envelope
TARGET_VGGT = 2.0         # 1B bf16 teacher at 518^2
V5E_BF16_PEAK_FLOPS = 197e12  # one v5e chip


_T0 = time.perf_counter()


def _log(msg: str) -> None:
    print(f"[{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _timed_reps(dispatch, state, n_reps, warmup_s, label):
    """Run `dispatch(state) -> (state, sync_scalar)` n_reps times and return
    (median_dt, per_rep_list, contention_flag).

    Round-4 lesson: one timed dispatch after one warmup let ambient
    host/tunnel contention swing the official number 3x (the r4 record
    shows a 143 s warmup for a dispatch whose steady state is ~6.6 s, then
    a 3x-slow single measurement). The median of N>=5 dispatches is robust
    to transient congestion; every rep + min/max goes to stderr so a noisy
    round is visible in the record instead of silently wrong.
    """
    reps = []
    for i in range(n_reps):
        t0 = time.perf_counter()
        state, sync = dispatch(state)
        float(sync)  # hard sync (tunnel ignores block_until_ready)
        reps.append(time.perf_counter() - t0)
    med = float(np.median(reps))
    # warmup legitimately includes the host->device input transfer
    # (~350 MB for the K=32 flagship batches, measured 3-4x one steady
    # dispatch through the tunnel), so only flag the truly pathological
    # ratio (the r4 corruption was 22x)
    contended = (warmup_s > 5.0 * med) or (max(reps) > 2.0 * min(reps))
    _log(f"{label}: reps_s={[round(r, 3) for r in reps]} median={med:.3f} "
         f"min={min(reps):.3f} max={max(reps):.3f} warmup={warmup_s:.1f}s"
         + (" CONTENTION-SUSPECT (warmup>5x steady or max>2x min)"
            if contended else ""))
    return med, reps, contended, state


def bench_mast3r(jax, jnp, teacher_dtype=None, metric="mast3r_distill_pairs_per_sec",
                 target=TARGET_MAST3R) -> dict:
    from gd3d.core.config import DistillConfig
    from gd3d.distill import make_optimizer
    from gd3d.distill.mast3r_step import build_mast3r_train_multistep
    from gd3d.distill.train_state import init_state
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.models.student import Student, split_params
    from gd3d.teachers.mast3r import Mast3rTeacher

    cfg = DistillConfig(teacher="mast3r", dataset="scannetpp")
    td = teacher_dtype or os.environ.get("GD3D_BENCH_TEACHER_DTYPE")
    if td:
        cfg = cfg.replace(teacher_dtype=td)
    if (metric == "mast3r_distill_pairs_per_sec"
            and cfg.teacher_dtype == "bfloat16"):
        # a GD3D_BENCH_TEACHER_DTYPE=bfloat16 override turns the flagship
        # run INTO the envelope config — hold it to the envelope target,
        # not the easier parity one, and name it accordingly
        metric = "mast3r_distill_pairs_per_sec_bf16env"
        target = TARGET_MAST3R_ENV
    sd = os.environ.get("GD3D_BENCH_STUDENT_DTYPE", "bfloat16")
    remat = os.environ.get("GD3D_BENCH_REMAT") == "1"
    stream = os.environ.get("GD3D_BENCH_BF16_STREAM") == "1"
    cfg = cfg.replace(
        student=dataclasses.replace(
            cfg.student, compute_dtype=sd, remat=remat, bf16_stream=stream))
    H, W = 336, 512  # ScanNet++ MASt3R true_shape
    BATCH = int(os.environ.get("GD3D_BENCH_BATCH", "1"))
    K = int(os.environ.get("GD3D_BENCH_K", "32"))

    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params)
    _log("mast3r: student init done")
    teacher = Mast3rTeacher(Mast3rConfig())
    # init at a small hw for speed: valid ONLY because nothing in
    # Mast3rConfig's param shapes is resolution-dependent (RoPE is computed,
    # not learned; DPT convs are size-agnostic). Guarded below.
    tparams = teacher.init_params(jax.random.key(1), hw=(64, 64))
    shapes_other = jax.eval_shape(
        lambda k: teacher.init_params(k, hw=(64, 96)), jax.random.key(1))
    assert jax.tree.all(jax.tree.map(
        lambda a, b: a.shape == b.shape, tparams, shapes_other)), (
        "teacher param shapes became resolution-dependent; init at the "
        "bench (H, W) instead of (64, 64)")
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)
    # K optimizer steps per dispatch (lax.scan) amortize host dispatch —
    # measured ~9% over per-step dispatch through the device tunnel
    step_fn = build_mast3r_train_multistep(student, teacher, cfg, tx,
                                           has_depth=False)

    rng = np.random.RandomState(0)
    batches = {
        "rgb_1": jnp.asarray(rng.rand(K, BATCH, 512, 512, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(K, BATCH, 512, 512, 3), jnp.float32),
        "rgb_mast3r_1": jnp.asarray(
            rng.rand(K, BATCH, H, W, 3) * 2 - 1, jnp.float32
        ),
        "rgb_mast3r_2": jnp.asarray(
            rng.rand(K, BATCH, H, W, 3) * 2 - 1, jnp.float32
        ),
        "intrinsic": jnp.asarray(
            np.tile(np.array([[256.0, 0, W / 2], [0, 256.0, H / 2], [0, 0, 1]],
                             np.float32), (K, BATCH, 1, 1))
        ),
    }

    # GD3D_BENCH_MESH=1: run the identical step THROUGH the DP mesh/pjit
    # machinery (the exact multi-chip code path, on however many chips are
    # attached) — quantifies mesh-path overhead vs the plain jit above.
    mesh_ctx = None
    if os.environ.get("GD3D_BENCH_MESH") == "1":
        from gd3d.core.mesh import make_mesh, shard_batch

        n_dev = len(jax.devices())
        mesh_ctx = make_mesh(n_data=n_dev, n_model=1)
        batches = shard_batch(mesh_ctx, batches, axis=1)

    # analytic matmul/conv FLOP count (jaxpr walk; XLA's cost_analysis
    # counts scan bodies once, undercounting scan-over-layers models ~20x)
    from gd3d.utils.flops import count_fn_flops

    _log("mast3r: teacher init done")
    try:
        flops = count_fn_flops(
            step_fn, state, frozen, tparams, batches, 1.0, while_trips=3)
    except Exception:
        flops = float("nan")
    _log("mast3r: FLOP count done")
    import contextlib

    with (mesh_ctx or contextlib.nullcontext()):
        compiled = jax.jit(step_fn).lower(
            state, frozen, tparams, batches, 1.0).compile()
        _log("mast3r: compile done")

        tw0 = time.perf_counter()
        state, metrics = compiled(state, frozen, tparams, batches, 1.0)
        # hard sync (tunnel ignores block_until_ready)
        float(metrics["loss"][-1])
        warmup_s = time.perf_counter() - tw0
        _log(f"mast3r: warmup dispatch done ({warmup_s:.1f}s)")

        n_reps = int(os.environ.get("GD3D_BENCH_REPS", "5"))

        def dispatch(st):
            st, m = compiled(st, frozen, tparams, batches, 1.0)
            return st, m["loss"][-1]

        dt, reps, contended, state = _timed_reps(
            dispatch, state, n_reps, warmup_s, f"mast3r[{metric}]")

    pairs_per_sec = BATCH * K / dt
    if mesh_ctx is not None:
        # the mesh path shards the global batch over n chips — divide so
        # the emitted number stays per-chip (the unit the baseline ratio
        # and round-over-round comparisons assume)
        pairs_per_sec /= mesh_ctx.devices.size
    mfu = flops / dt / V5E_BF16_PEAK_FLOPS
    _log(f"mast3r step: student={sd} teacher={cfg.teacher_dtype} "
         f"batch={BATCH} K={K}"
         f"{' mesh=' + str(dict(mesh_ctx.shape)) if mesh_ctx else ''}: "
         f"{pairs_per_sec:.3f} pairs/s, "
         f"{flops / (BATCH * K) / 1e12:.2f} TFLOP/pair (analytic matmul/conv "
         f"count), MFU={mfu * 100:.1f}% of v5e bf16 peak")
    return {
        "metric": metric,
        "value": round(pairs_per_sec, 4),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_sec / target, 6),
        "vs_north_star_2000": round(pairs_per_sec / NORTH_STAR_PAIRS_PER_SEC, 6),
        "mfu_pct": round(mfu * 100, 2) if np.isfinite(mfu) else None,
        "reps_s": [round(r, 3) for r in reps],
        "contention_suspect": bool(contended),
    }


def bench_vggt(jax, jnp) -> dict:
    """Full-scale VGGT distillation step (1B-param teacher at 518^2, random
    weights — identical FLOP/memory profile to the released checkpoint)."""
    from gd3d.core.config import DistillConfig, LossWeights
    from gd3d.distill import make_optimizer
    from gd3d.distill.train_state import init_state
    from gd3d.distill.vggt_step import build_vggt_train_multistep
    from gd3d.models.student import Student, split_params
    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher

    sd = os.environ.get("GD3D_BENCH_STUDENT_DTYPE", "bfloat16")
    cfg = DistillConfig(
        teacher="vggt", dataset="scannetpp",
        loss_weights=LossWeights(ap=1.0, depth=1.0, intra_depth=1.0, kl=1.0),
        teacher_dtype="bfloat16",  # reference runs the 1B aggregator bf16
    )
    cfg = cfg.replace(
        student=dataclasses.replace(cfg.student, compute_dtype=sd))

    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params)
    teacher = VggtTeacher(VggtConfig())
    # init at full resolution: the track head's corr pyramid needs a real
    # feature-map extent to trace (28x28 underflows the 7-level pyramid)
    tparams = teacher.init_params(
        jax.random.key(1), hw=(teacher.cfg.img_size,) * 2)
    _log("vggt: teacher init done")
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)
    # K steps per dispatch (lax.scan) — same tunnel-overhead amortization as
    # the flagship MASt3R bench
    K = int(os.environ.get("GD3D_BENCH_VGGT_K", "8"))
    step_fn = build_vggt_train_multistep(student, teacher, cfg, tx)
    step = jax.jit(step_fn)

    rng = np.random.RandomState(0)
    V, R = 518, 512
    batch = {
        "rgb_1": jnp.asarray(rng.rand(K, 1, R, R, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(K, 1, R, R, 3), jnp.float32),
        "rgb_vggt": jnp.asarray(rng.rand(K, 1, 2, V, V, 3), jnp.float32),
    }
    key = jax.random.key(0)
    # analytic matmul/conv FLOP count for the MFU diagnostic (same jaxpr
    # walk as the MASt3R bench; the 1B aggregator dominates)
    from gd3d.utils.flops import count_fn_flops

    try:
        flops = count_fn_flops(
            step_fn, state, frozen, tparams, batch, 1.0, key, while_trips=3)
    except Exception as e:
        _log(f"vggt: FLOP count failed: {e!r}")
        flops = float("nan")
    _log("vggt: FLOP count done")
    tw0 = time.perf_counter()
    state, metrics = step(state, frozen, tparams, batch, 1.0, key)
    float(metrics["loss"][-1])
    warmup_s = time.perf_counter() - tw0
    _log(f"vggt: compile + warmup dispatch done ({warmup_s:.1f}s)")

    n_reps = int(os.environ.get("GD3D_BENCH_REPS", "5"))

    def dispatch(st):
        st, m = step(st, frozen, tparams, batch, 1.0, key)
        return st, m["loss"][-1]

    # warmup_s here includes jit-compile (no separate .compile() call), so
    # only the rep-spread criterion is meaningful for contention detection
    dt_total, reps, contended, state = _timed_reps(
        dispatch, state, n_reps, 0.0, "vggt")
    dt = dt_total / K
    mfu = flops / dt_total / V5E_BF16_PEAK_FLOPS
    _log(f"vggt step: student={sd} teacher=bfloat16 K={K}: "
         f"{1.0 / dt:.3f} pairs/s, {flops / K / 1e12:.2f} TFLOP/pair "
         f"(analytic matmul/conv count), MFU={mfu * 100:.1f}% of v5e "
         f"bf16 peak")
    return {
        "metric": "vggt_distill_pairs_per_sec",
        "value": round(1.0 / dt, 4),
        "unit": "pairs/s/chip",
        "vs_baseline": round(1.0 / dt / TARGET_VGGT, 6),
        "vs_north_star_2000": round(1.0 / dt / NORTH_STAR_PAIRS_PER_SEC, 6),
        "mfu_pct": round(mfu * 100, 2) if np.isfinite(mfu) else None,
        "reps_s": [round(r, 3) for r in reps],
        "contention_suspect": bool(contended),
    }


def main() -> None:
    import jax

    # persistent compile cache: the MASt3R distill graph is large and this
    # process may be re-launched per round — compile once, reuse forever.
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    flagship = json.dumps(bench_mast3r(jax, jnp))
    print(flagship, flush=True)
    printed_extra = False
    if os.environ.get("GD3D_BENCH_VGGT", "1") != "0":
        # guarded: a secondary-metric failure must not cost the flagship
        try:
            print(json.dumps(bench_vggt(jax, jnp)), flush=True)
            printed_extra = True
        except Exception as e:  # pragma: no cover
            _log(f"VGGT bench failed: {e!r}")
    if (os.environ.get("GD3D_BENCH_ENV", "1") != "0"
            and not os.environ.get("GD3D_BENCH_TEACHER_DTYPE")):
        # the fastest measured configuration (all-bf16 envelope) as its own
        # regression-guarded metric
        try:
            print(json.dumps(bench_mast3r(
                jax, jnp, teacher_dtype="bfloat16",
                metric="mast3r_distill_pairs_per_sec_bf16env",
                target=TARGET_MAST3R_ENV)), flush=True)
            printed_extra = True
        except Exception as e:  # pragma: no cover
            _log(f"bf16-envelope bench failed: {e!r}")
    if printed_extra:
        # keep the last-line contract: the flagship metric is final,
        # whatever combination of secondary metrics printed after it
        print(flagship, flush=True)


if __name__ == "__main__":
    main()
