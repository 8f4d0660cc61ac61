"""Max-pool NMS keypoint sampling with a static output shape.

Parity target: utils/functions.py:475-508 (sample_keypoints_nms) — local
maxima of a masked confidence map, randomly subsampled to N.

The reference returns a dynamic (M, 2) tensor via torch.nonzero; here we keep
the shapes static for jit: NMS survivors get a random priority, a single
top-k picks N of them, and a validity mask marks real keypoints. For M > N
this draws a uniform random N-subset (same distribution as randperm[:N]); for
M <= N all survivors are returned valid.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def sample_keypoints_nms(
    mask: jnp.ndarray,
    conf: jnp.ndarray,
    num: int,
    min_distance: int,
    rng: jax.Array,
    eps: float = 1e-6,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sample up to `num` NMS keypoints from conf restricted to mask.

    Args:
      mask: (H, W) bool visibility mask.
      conf: (H, W) confidence.
    Returns:
      kps: (num, 2) int32 as (y, x) — torch.nonzero row/col order.
      valid: (num,) bool.
    """
    H, W = mask.shape
    score = jnp.where(mask, conf, 0.0).astype(jnp.float32)

    k = int(min_distance) * 2 + 1
    pad = k // 2
    pooled = jax.lax.reduce_window(
        score,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(k, k),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )
    nms = (jnp.abs(score - pooled) < eps) & mask

    flat = nms.reshape(-1)
    priority = jnp.where(
        flat, jax.random.uniform(rng, (H * W,), jnp.float32), -1.0
    )
    _, idx = jax.lax.top_k(priority, num)
    valid = flat[idx]
    ys = idx // W
    xs = idx % W
    kps = jnp.stack([ys, xs], axis=-1).astype(jnp.int32)
    return kps, valid
