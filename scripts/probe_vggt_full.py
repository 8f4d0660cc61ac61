"""Probe: full-size VGGT (1B) teacher feature-extraction on the real chip.

The VGGT distillation step's teacher cost is `extract_features` (aggregator
alternating attention + layer-7 cross-frame cost export, vggt.py /
finetune_timm_vggt.py:519-533). No full checkpoint ships in this image, so
this probes random weights — the FLOPs/memory profile is identical.

Run:  python scripts/probe_vggt_full.py [n_iters]
Prints seconds/frame-pair for the bf16 teacher pass at 518x518, 2 frames.
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

    from gd3d.models.vggt.config import VggtConfig
    from gd3d.teachers.vggt import VggtTeacher

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = VggtConfig()  # full size: 24-layer x2 alternating, embed 1024 + DINO-L
    teacher = VggtTeacher(cfg)
    print("initializing full VGGT params on device ...", flush=True)
    params = teacher.init_params(jax.random.key(0), hw=(cfg.img_size,) * 2)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_params / 1e9:.2f}B", flush=True)

    feats_fn = jax.jit(
        lambda p, imgs: teacher.extract_features(
            p, imgs, 10.0, dtype=jnp.bfloat16
        )
    )
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(1, 2, cfg.img_size, cfg.img_size, 3),
        jnp.float32,
    )
    t0 = time.perf_counter()
    out = feats_fn(params, imgs)
    # hard sync: the axon tunnel ignores block_until_ready
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = feats_fn(params, imgs)
    float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"vggt_full_teacher_extract: {dt * 1e3:.1f} ms/pair "
          f"({1.0 / dt:.2f} pairs/s)", flush=True)


if __name__ == "__main__":
    main()
