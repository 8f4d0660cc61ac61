"""Device-trace the flagship MASt3R step and print the per-op time table.

Captures a jax.profiler trace of ONE multistep dispatch (K steps) and
aggregates the TPU device plane's events by op name — the ground-truth
answer to "where do the milliseconds go" that the scan-probes can only
approximate from outside. Run: python scripts/probe_trace_step.py [K]
"""
from __future__ import annotations

import dataclasses
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gd3d_trace"


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from gd3d.core.config import DistillConfig
    from gd3d.distill import make_optimizer
    from gd3d.distill.mast3r_step import build_mast3r_train_multistep
    from gd3d.distill.train_state import init_state
    from gd3d.models.mast3r import Mast3rConfig
    from gd3d.models.student import Student, split_params
    from gd3d.teachers.mast3r import Mast3rTeacher

    cfg = DistillConfig(teacher="mast3r", dataset="scannetpp")
    sd = os.environ.get("GD3D_BENCH_STUDENT_DTYPE", "bfloat16")
    td = os.environ.get("GD3D_BENCH_TEACHER_DTYPE")
    if td:
        cfg = cfg.replace(teacher_dtype=td)
    cfg = cfg.replace(student=dataclasses.replace(
        cfg.student, compute_dtype=sd))
    H, W = 336, 512

    student = Student(cfg.student)
    params = student.init(jax.random.key(0), img_size=64)
    trainable, frozen = split_params(params)
    teacher = Mast3rTeacher(Mast3rConfig())
    tparams = teacher.init_params(jax.random.key(1), hw=(64, 64))
    tx = make_optimizer(cfg.train)
    state = init_state(tx, trainable)
    step_fn = build_mast3r_train_multistep(student, teacher, cfg, tx,
                                           has_depth=False)
    rng = np.random.RandomState(0)
    batches = {
        "rgb_1": jnp.asarray(rng.rand(K, 1, 512, 512, 3), jnp.float32),
        "rgb_2": jnp.asarray(rng.rand(K, 1, 512, 512, 3), jnp.float32),
        "rgb_mast3r_1": jnp.asarray(
            rng.rand(K, 1, H, W, 3) * 2 - 1, jnp.float32),
        "rgb_mast3r_2": jnp.asarray(
            rng.rand(K, 1, H, W, 3) * 2 - 1, jnp.float32),
        "intrinsic": jnp.asarray(np.tile(np.array(
            [[256.0, 0, W / 2], [0, 256.0, H / 2], [0, 0, 1]],
            np.float32), (K, 1, 1, 1))),
    }
    compiled = jax.jit(step_fn).lower(
        state, frozen, tparams, batches, 1.0).compile()
    state, metrics = compiled(state, frozen, tparams, batches, 1.0)
    float(metrics["loss"][-1])
    print("warmup done; tracing one dispatch", flush=True)

    jax.profiler.start_trace(OUT)
    state, metrics = compiled(state, frozen, tparams, batches, 1.0)
    float(metrics["loss"][-1])
    jax.profiler.stop_trace()

    analyze_trace(OUT, K)


HBM_GBPS = 819.0  # v5e HBM bandwidth


def analyze_trace(out_dir: str, k: int) -> None:
    """Aggregate the device 'XLA Ops' track: self-time per op (duration
    minus contained children — while/fusion events nest) grouped by
    hlo_category, plus the top individual ops. bytes_accessed gives each
    category's implied HBM bandwidth — the compute-vs-memory verdict."""
    import collections

    trace_file = None
    for root, _dirs, files in os.walk(out_dir):
        for fn in files:
            if fn.endswith("trace.json.gz"):
                trace_file = os.path.join(root, fn)
    assert trace_file, f"no trace under {out_dir}"
    d = json.load(gzip.open(trace_file))
    evs = d["traceEvents"]
    device_pids = {e["pid"] for e in evs
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in evs
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("pid") in device_pids
               and e.get("args", {}).get("name") == "XLA Ops"}
    tracks = collections.defaultdict(list)
    for e in evs:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            tracks[(e["pid"], e["tid"])].append(e)
    by_op = collections.defaultdict(lambda: [0, 0.0, 0.0, ""])
    total = 0.0
    for _track, es in tracks.items():
        es.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # [end_ts, self_acc list]
        for e in es:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                stack[-1][1][0] -= dur
            rec = [dur]
            stack.append([ts + dur, rec])
            e["_self"] = rec
        for e in es:
            s = max(e["_self"][0], 0.0) / 1e3  # us -> ms
            args = e.get("args", {})
            r = by_op[e["name"]]
            r[0] += 1
            r[1] += s
            r[2] += float(args.get("bytes_accessed", 0) or 0)
            r[3] = args.get("hlo_category", "?")
            total += s
    by_cat = collections.defaultdict(lambda: [0, 0.0, 0.0])
    for _name, (cnt, t, b, cat) in by_op.items():
        by_cat[cat][0] += cnt
        by_cat[cat][1] += t
        by_cat[cat][2] += b
    print(f"\ndevice op self-time total {total / k:.1f} ms/step "
          f"(over {k} steps); by hlo_category:")
    print(f"{'ms/step':>8} {'%':>5} {'GB/s':>6} {'count':>6}  category")
    for cat, (cnt, t, b) in sorted(by_cat.items(), key=lambda x: -x[1][1]):
        gbps = b / 1e9 / (t / 1e3) if t else 0.0
        print(f"{t / k:8.2f} {t / total * 100:5.1f} {gbps:6.0f} "
              f"{cnt // k:6d}  {cat}")
    print(f"\ntop ops (self time; GB/s = bytes_accessed / self-time, "
          f"HBM peak ~{HBM_GBPS:.0f}):")
    print(f"{'ms/step':>8} {'%':>5} {'GB/s':>6} {'n/step':>6}  name")
    for name, (cnt, t, b, cat) in sorted(
            by_op.items(), key=lambda x: -x[1][1])[:40]:
        gbps = b / 1e9 / (t / 1e3) if t else 0.0
        print(f"{t / k:8.2f} {t / total * 100:5.1f} {gbps:6.0f} "
              f"{cnt // k:6d}  [{cat[:14]}] {name[:80]}")

    # ---- roofline segments: group self-time by the model stage the op
    # belongs to, via the op_name scope metadata XLA records per HLO op
    # (jit(train_step)/jvp(Mast3r)/encoder/..., transpose(jvp(...))/... )
    import re

    segs = [
        ("teacher-encoder", r"Mast3r\)/encoder|enc_blocks"),
        ("teacher-decoder", r"Mast3r\)/dec|dec_pairs|decoder"),
        ("teacher-dpt+desc", r"Mast3r\)/head|head1|head2|dpt"),
        ("student-vit", r"Student|/vit/|blocks_plain|blocks_adapt"),
        ("keypoints+nms", r"keypoint|fast_nn|nms|filter_and_match"),
        ("losses", r"loss|cost_kl|pairwise|ap_|kl_|depth_diff"),
        ("optimizer", r"adam|optax|clip_by|update"),
    ]
    by_seg = collections.defaultdict(lambda: [0.0, 0.0])
    for e in [e for es in tracks.values() for e in es]:
        s = max(e["_self"][0], 0.0) / 1e3
        scope = str(e.get("args", {}).get("op_name", "") or
                    e.get("args", {}).get("long_name", "") or e["name"])
        for seg, pat in segs:
            if re.search(pat, scope, re.IGNORECASE):
                by_seg[seg][0] += s
                by_seg[seg][1] += float(
                    e.get("args", {}).get("bytes_accessed", 0) or 0)
                break
        else:
            by_seg["(other)"][0] += s
            by_seg["(other)"][1] += float(
                e.get("args", {}).get("bytes_accessed", 0) or 0)
    print("\nby model segment (scope-matched self time):")
    print(f"{'ms/step':>8} {'%':>5} {'GB/s':>6}  segment")
    for seg, (t, b) in sorted(by_seg.items(), key=lambda x: -x[1][0]):
        gbps = b / 1e9 / (t / 1e3) if t else 0.0
        print(f"{t / k:8.2f} {t / total * 100:5.1f} {gbps:6.0f}  {seg}")
    # one sample scope so the segment regexes can be re-derived if the
    # metadata format changes
    for e in [e for es in tracks.values() for e in es][:200]:
        nm = str(e.get("args", {}).get("op_name", ""))
        if "/" in nm:
            print(f"\nsample op_name scope: {nm[:160]}")
            break


if __name__ == "__main__":
    main()
