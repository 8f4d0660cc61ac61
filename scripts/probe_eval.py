"""On-chip timings of the three eval harnesses at reference shapes.

VERDICT r2 item 5: the reference's eval is its wall-clock hog (tracking T^2
anchors, /root/reference/utils/tracking_model.py:531-540; PF-PASCAL per-pair
re-dispatch, src/evaluate_timm.py:461-588; OnePose dense grids :128-164) —
gd3d batched/jit-cached those paths but published no numbers. This probe
measures, on the real chip with the full ViT-B/16 student:

  1. PF-PASCAL semantic-transfer pair matching (640^2 canvases, 20 kps)
  2. TAP-Vid tracking: per-frame stride-8 features (464x848) + the
     trajectory engine (trajectories + cos sims + T^2 anchors) per video
  3. OnePose query-frame descriptors (512x512, stride-4 grid = 16k kps)
     + host-side chunked mutual-NN matching against a 120k template bank

Run: python scripts/probe_eval.py [T_frames]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T_FRAMES = 40  # per-video frame count for the trajectory engine


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from gd3d.core.config import StudentConfig
    from gd3d.models.student import Student

    global T_FRAMES
    if len(sys.argv) > 1:
        T_FRAMES = int(sys.argv[1])

    student = Student(StudentConfig())  # full ViT-B/16
    params = student.init(jax.random.key(0), img_size=64)
    rng = np.random.RandomState(0)

    # ---- 1. PF-PASCAL pair matching --------------------------------------
    from gd3d.eval.pck import make_match_fn

    match = make_match_fn(student, img_size=640, refine=True, max_kps=20)
    pairs = [
        (
            rng.randint(0, 255, (640, 640, 3), np.uint8),
            rng.randint(0, 255, (640, 640, 3), np.uint8),
            rng.rand(20, 2).astype(np.float32) * 600,
        )
        for _ in range(6)
    ]
    match(params, *pairs[0])  # compile
    t0 = time.perf_counter()
    for im1, im2, kps in pairs:
        match(params, im1, im2, kps)
    dt = (time.perf_counter() - t0) / len(pairs)
    print(f"PCK pair match (640^2, 2 dense fwd + argmax): {dt * 1e3:.1f} "
          f"ms/pair = {1 / dt:.2f} pairs/s", flush=True)

    # batched dispatch (match.many, 8 pairs/program, u8 canvases): amortizes
    # the ~40 ms tunnel dispatch + quarters the canvas transfer bytes
    many = pairs * 4  # 24 pairs = 3 full chunks
    match.many(params, many[:8])  # compile B=8
    t0 = time.perf_counter()
    match.many(params, many)
    dt_b = (time.perf_counter() - t0) / len(many)
    print(f"PCK pair match BATCHED (8 pairs/dispatch, u8): "
          f"{dt_b * 1e3:.1f} ms/pair = {1 / dt_b:.2f} pairs/s "
          f"({dt / dt_b:.1f}x over per-pair dispatch)", flush=True)

    # ---- 2. TAP-Vid tracking ---------------------------------------------
    from gd3d.eval.tracker import (
        TrackerConfig,
        anchor_trajectories,
        compute_occlusion,
        generate_trajectories,
        trajectory_cos_sims,
    )

    h, w = 464, 848  # 476x854 cropped to /16
    stride = student.cfg.patch_size // 2
    gh, gw = h // stride, w // stride

    feat_fn = jax.jit(
        lambda p, x: student.dense_grid_features(p, x, stride=stride,
                                                 refine=True)
    )
    frame = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
    np.asarray(feat_fn(params, frame))  # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = feat_fn(params, frame)
    np.asarray(out)
    dt_frame = (time.perf_counter() - t0) / reps
    print(f"tracking per-frame features (stride 8, {gh}x{gw} grid): "
          f"{dt_frame * 1e3:.1f} ms/frame = {1 / dt_frame:.2f} frames/s",
          flush=True)

    # video_features: 4 frames/dispatch, u8 transfer, device-resident out
    from gd3d.eval.tracking import video_features

    vid_u8 = rng.randint(0, 255, (T_FRAMES, h, w, 3), np.uint8)
    video_features(student, params, vid_u8[:8]).block_until_ready()  # compile
    t0 = time.perf_counter()
    video_features(student, params, vid_u8).block_until_ready()
    dt_vid = (time.perf_counter() - t0) / T_FRAMES
    print(f"tracking video_features BATCHED (4 frames/dispatch, u8, "
          f"device-resident): {dt_vid * 1e3:.1f} ms/frame "
          f"({dt_frame / dt_vid:.1f}x over per-frame dispatch)", flush=True)

    cfg = TrackerConfig(video_h=h, video_w=w, stride=stride,
                        patch_size=student.cfg.patch_size)
    N_q = 26  # TAP-Vid strided query count ballpark
    feats = jnp.asarray(rng.rand(T_FRAMES, gh, gw, 768), jnp.float32)
    qp = jnp.asarray(
        np.stack([rng.rand(N_q) * (w - 8), rng.rand(N_q) * (h - 8),
                  rng.randint(0, T_FRAMES, N_q)], -1), jnp.float32)

    def engine(f, q):
        trajs = generate_trajectories(f, q, cfg)
        cos, _ = trajectory_cos_sims(f, trajs, q, cfg)
        anchors = anchor_trajectories(f, trajs, cfg)
        return trajs, cos, anchors

    eng = jax.jit(engine)
    r = eng(feats, qp)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = eng(feats, qp)
    trajs, cos, anchors = jax.tree_util.tree_map(np.asarray, r)
    dt_eng = time.perf_counter() - t0
    t0 = time.perf_counter()
    compute_occlusion(trajs, cos, anchors, cfg)
    dt_occ = time.perf_counter() - t0
    total_video = dt_vid * T_FRAMES + dt_eng + dt_occ
    print(f"tracking engine (T={T_FRAMES}, N={N_q}: trajs + cos + T^2 "
          f"anchors): {dt_eng:.2f} s device + {dt_occ * 1e3:.0f} ms host "
          f"occlusion", flush=True)
    print(f"tracking TOTAL ~{total_video:.2f} s/video "
          f"({T_FRAMES} frames, batched features)", flush=True)

    # ---- 3. OnePose ------------------------------------------------------
    from gd3d.eval.onepose import frame_descriptors, grid_keypoints, \
        mutual_nn_match

    frame_np = rng.randint(0, 255, (512, 512, 3), np.uint8)
    kps = grid_keypoints(512, 512, stride=4).astype(np.float32)  # 128^2
    d = frame_descriptors(student, params, frame_np, kps)  # compile
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        d = frame_descriptors(student, params, frame_np, kps)
    dt_desc = (time.perf_counter() - t0) / reps
    print(f"OnePose query descriptors (512^2, {len(kps)} kps): "
          f"{dt_desc * 1e3:.1f} ms/frame", flush=True)
    # breakdown: host resize vs device compute+transfer
    import cv2 as _cv2

    t0 = time.perf_counter()
    for _ in range(reps):
        img = _cv2.resize(frame_np.astype(np.float64) / 255.0, (1024, 1024))
    dt_resize = (time.perf_counter() - t0) / reps
    from gd3d.eval.onepose import _DESC_JIT_CACHE

    fn = next(iter(_DESC_JIT_CACHE.values()))
    imj = jnp.asarray(img[None], jnp.float32)
    kpj = jnp.asarray(kps[None])
    np.asarray(fn(params, imj, kpj))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(params, imj, kpj)
    np.asarray(out)
    dt_dev = (time.perf_counter() - t0) / reps
    print(f"  ... cv2 f64 resize {dt_resize * 1e3:.0f} ms + device fwd+"
          f"interp {dt_dev * 1e3:.0f} ms (rest = H2D/D2H of the frame/"
          f"descs)", flush=True)

    from gd3d.eval.onepose import mutual_nn_match_device

    # the real eval keeps descriptors AND the bank on-device for the whole
    # object (evaluate_object device=on_tpu path) — measure that flow
    d_dev = frame_descriptors(student, params, frame_np, kps, device=True)
    t0 = time.perf_counter()
    for _ in range(reps):
        d_dev = frame_descriptors(student, params, frame_np, kps,
                                  device=True)
    jax.block_until_ready(d_dev)
    dt_desc_dev = (time.perf_counter() - t0) / reps
    bank = rng.randn(120_000, 768).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=-1, keepdims=True)
    bank_dev = jnp.asarray(bank)
    t0 = time.perf_counter()
    mutual_nn_match_device(d_dev, bank_dev)  # cold: compiles both dirs
    dt_match0 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        nn = mutual_nn_match_device(d_dev, bank_dev)
    dt_match = (time.perf_counter() - t0) / reps
    tot = dt_desc_dev + dt_match
    print(f"OnePose on-device flow: descs {dt_desc_dev * 1e3:.0f} ms + "
          f"mutual-NN vs 120k bank {dt_match * 1e3:.0f} ms (cold "
          f"{dt_match0:.1f} s) = {tot:.2f} s/frame = {1 / tot:.2f} "
          f"frames/s", flush=True)


if __name__ == "__main__":
    main()
