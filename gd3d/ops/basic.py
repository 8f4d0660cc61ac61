"""Small numeric primitives shared across losses and eval.

Reference: /root/reference/utils/functions.py:24-33.
"""
from __future__ import annotations

import jax.numpy as jnp


def temp_sigmoid(x: jnp.ndarray, temp: float = 1.0) -> jnp.ndarray:
    """Temperature-controlled sigmoid with +/-50 exponent clamp.

    Matches utils/functions.py:24-33: y = 1/(1+exp(clamp(-x/temp, -50, 50))).
    """
    exponent = jnp.clip(-x / temp, -50.0, 50.0)
    return 1.0 / (1.0 + jnp.exp(exponent))


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize(p=2) semantics: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
