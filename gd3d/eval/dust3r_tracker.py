"""DUSt3R/MASt3R point-matching tracker — the alternative tracking engine.

Parity target: utils/tracking_model.py:336-379 (Dust3rTracker): for a query
point in a source frame, run two-view inference on (src, tgt), take the
query's 3D point from the source prediction and place the track at the
argmin-distance pixel of the target's pts3d_in_other_view map (both maps
live in the source camera frame). Pair predictions are cached.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gd3d.teachers.mast3r import Mast3rTeacher


class Dust3rTracker:
    def __init__(self, teacher: Mast3rTeacher, params: dict):
        self.teacher = teacher
        self.params = params
        self._cache: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}

        @jax.jit
        def _pair(params, img1, img2):
            out = self.teacher.model.apply(
                {"params": params}, img1[None], img2[None], 1.0
            )
            # symmetrized batch: element 1 is the (view1=img1, view2=img2)
            # direction (gd3d/models/mast3r.py)
            pts1 = out["res1"]["pts3d"][1]
            pts2 = out["res2"]["pts3d_in_other_view"][1]
            return pts1, pts2

        self._pair_fn = _pair

    def _pair_pts(self, frames_m11: np.ndarray, src_t: int, tgt_t: int):
        key = (src_t, tgt_t)
        if key not in self._cache:
            p1, p2 = self._pair_fn(
                self.params,
                jnp.asarray(frames_m11[src_t]),
                jnp.asarray(frames_m11[tgt_t]),
            )
            self._cache[key] = (np.asarray(p1), np.asarray(p2))
        return self._cache[key]

    def track(
        self, frames: np.ndarray, query_points: np.ndarray
    ) -> np.ndarray:
        """frames (T, H, W, 3) in [0, 1]; query_points (N, 3) as (x, y, t)
        pixels. Returns (N, T, 2) predicted (x, y) per frame."""
        # the pair cache is keyed by frame INDICES — clear it so reusing
        # one tracker across videos can't serve another video's 3D points
        self._cache.clear()
        frames_m11 = frames * 2.0 - 1.0  # ImgNorm(0.5, 0.5)
        T, H, W, _ = frames.shape
        N = query_points.shape[0]
        out = np.zeros((N, T, 2), np.float32)
        for n in range(N):
            x, y, t = query_points[n]
            src_t = int(round(t))
            for tgt_t in range(T):
                pts1, pts2 = self._pair_pts(frames_m11, src_t, tgt_t)
                src3d = pts1[int(y), int(x)]
                d = np.linalg.norm(pts2.reshape(-1, 3) - src3d, axis=-1)
                best = int(d.argmin())
                out[n, tgt_t] = (best % W, best // W)
        return out
