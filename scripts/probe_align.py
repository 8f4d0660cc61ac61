"""Time dense vs sparse global alignment at a realistic scene size.

N images at the MASt3R 224-crop resolution, complete pair graph, 300
Adam iterations — the whole loop is one dispatch either way, so this
measures pure device throughput of the scene optimizer.

Run: python scripts/probe_align.py [n_imgs]
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

    from gd3d.align import Scene, global_align, sparse_from_scene

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    H = W = 224
    rng = np.random.RandomState(0)

    edges, pred_i, pred_j, conf_i, conf_j = [], [], [], [], []
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            edges.append((i, j))
            pred_i.append(rng.rand(H, W, 3).astype(np.float32) * 2 + 1)
            pred_j.append(rng.rand(H, W, 3).astype(np.float32) * 2 + 1)
            conf_i.append(1.0 + rng.rand(H, W).astype(np.float32) * 3)
            conf_j.append(1.0 + rng.rand(H, W).astype(np.float32) * 3)
    scene = Scene.from_pairs(edges, pred_i, pred_j, conf_i, conf_j)
    print(f"{n} imgs, {len(edges)} edges, {H}x{W} ({H * W} px/img)")

    def timed(label, s, niter=300):
        t0 = time.perf_counter()
        out = global_align(s, niter=niter)
        float(out["losses"][-1])
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = global_align(s, niter=niter)
        float(out["losses"][-1])
        warm = time.perf_counter() - t0
        print(f"{label}: {warm * 1e3:.0f} ms warm ({niter} iters; cold "
              f"{cold:.1f} s incl. init+compile)", flush=True)

    timed("dense  (50k px/img)   ", scene)
    timed("sparse (1024 anchors) ", sparse_from_scene(scene, k=1024))


if __name__ == "__main__":
    main()
