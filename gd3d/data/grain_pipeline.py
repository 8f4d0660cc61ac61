"""Grain-based host input pipeline (the BASELINE.md north-star loader).

Wraps any of the gd3d pair samplers (map-style, numpy dicts) into a
grain.MapDataset chain: seeded shuffle -> per-sample transform -> batch ->
multi-worker prefetch. This is the production host pipeline; the threaded
PrefetchLoader (gd3d/data/loader.py) remains the dependency-light fallback.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional


def make_grain_loader(
    dataset,
    batch_size: int = 1,
    seed: int = 42,
    transform: Optional[Callable[[Dict], Dict]] = None,
    worker_count: int = 0,
    epochs: Optional[int] = 1,
    shard_index: Optional[int] = None,
    shard_count: Optional[int] = None,
):
    """Returns an iterator of collated numpy batches via grain.

    dataset: any object with __len__/__getitem__ returning dicts of numpy
    arrays (strings/None values are dropped at collation).

    Multi-host: by default the sampler shards by JAX process (each host
    reads a disjoint 1/process_count slice per epoch — the per-rank
    DataLoader of the reference's DDP setup, src/main.py:147-161; a no-op
    single-process). Pass shard_index/shard_count to override explicitly
    (also how the unit test exercises it without multiple processes).
    """
    import grain.python as grain
    import numpy as np

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, idx):
            s = dataset[int(idx)]
            # transform FIRST, strip strings/Nones AFTER — matching the
            # fallback PrefetchLoader (transform sees the full sample,
            # collate drops unbatchable values), so the two loaders accept
            # the same transforms
            if transform:
                s = transform(s)
            return {k: v for k, v in s.items()
                    if v is not None and not isinstance(v, str)}

    if shard_index is None or shard_count is None:
        import jax

        shard_index = jax.process_index()
        shard_count = jax.process_count()
    shard = (grain.NoSharding() if shard_count == 1 else
             grain.ShardOptions(shard_index=shard_index,
                                shard_count=shard_count,
                                drop_remainder=True))
    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shuffle=True,
        seed=seed,
        num_epochs=epochs,
        shard_options=shard,
    )
    loader = grain.DataLoader(
        data_source=_Source(),
        sampler=sampler,
        operations=[grain.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
    )
    return iter(loader)
