"""Device-mesh and sharding helpers.

The reference's parallelism is Lightning DDP over NCCL
(/root/reference/src/main.py:147-161). TPU-native equivalent: one
`jax.sharding.Mesh` with a `data` axis (DP over image pairs) and a `model`
axis (TP for the 1B-param VGGT teacher). Gradient all-reduce and activation
collectives compile to XLA collectives over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    n_model = max(1, n_model)
    if n_data <= 0:
        n_data = n // n_model
    assert n_data >= 1, (
        f"n_model={n_model} exceeds the {n} available devices")
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    if n_data * n_model < n:
        print(f"WARNING: mesh {n_data}x{n_model} uses "
              f"{n_data * n_model} of {n} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1, axis: int = 0) -> NamedSharding:
    """Shard dim `axis` (the batch dim) over the data axis, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: int = 0):
    """Device_put a pytree of host arrays with batch-dim sharding.

    `axis` selects which dim is the batch dim — the multistep scan trainer
    stacks K step-batches on a new leading axis, so its batch dim is axis 1.
    """
    def _put(x):
        return jax.device_put(
            x, data_sharding(mesh, ndim=max(1, x.ndim), axis=axis))
    return jax.tree_util.tree_map(_put, batch)
