"""Host data pipeline: batching, padding and background prefetch.

The reference uses torch DataLoader with 10 workers + pinned memory
(src/finetune_timm_mast3r.py:229-240). TPU-native equivalent: a seeded
background-thread prefetcher that assembles fixed-shape numpy batches
(sharded per-host in multi-process setups) while the device computes; jit
dispatch overlaps host decode with the previous step.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


def pad_keypoints(kps: np.ndarray, pts3d: np.ndarray, capacity: int,
                  valid: Optional[np.ndarray] = None):
    """Pad (N, 2)/(N, 3) keypoint arrays to `capacity` with a validity mask."""
    n = kps.shape[0]
    if valid is None:
        valid = np.ones((n,), bool)
    if n >= capacity:
        return (
            kps[:capacity].astype(np.float32),
            pts3d[:capacity].astype(np.float32),
            valid[:capacity],
        )
    pad = capacity - n
    # cast BEFORE concatenate: float64 inputs would otherwise promote the
    # padded branch while the truncation branch casts, giving per-sample
    # dtype drift across the batch
    return (
        np.concatenate([kps.astype(np.float32),
                        np.zeros((pad, kps.shape[1]), np.float32)]),
        np.concatenate([pts3d.astype(np.float32),
                        np.zeros((pad, pts3d.shape[1]), np.float32)]),
        np.concatenate([valid.astype(bool), np.zeros((pad,), bool)]),
    )


def collate(samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
    """Stack a list of dict samples into batched numpy arrays (string and
    None values dropped)."""
    out = {}
    for k, v in samples[0].items():
        if v is None or isinstance(v, str):
            continue
        out[k] = np.stack([np.asarray(s[k]) for s in samples])
    return out


class PrefetchIterator:
    """Wrap ANY iterator with a daemon producer thread + bounded queue.

    The producer runs the wrapped iterator (host decode, collation, even
    jax.device_put — all thread-safe) while the consumer's device step
    executes, giving the reference's DataLoader-worker overlap
    (src/finetune_timm_mast3r.py:232-240) without processes. `wait_time`
    accumulates the seconds the consumer spent blocked on the queue — the
    host-bound fraction of the step loop, for the profiler.
    """

    def __init__(self, it: Iterator, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = object()
        self._err: Optional[BaseException] = None
        self.wait_time = 0.0

        def worker():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as e:  # surfaced on the consumer side
                self._err = e
            finally:
                self._q.put(self._stop)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        import time

        t0 = time.perf_counter()
        item = self._q.get()
        self.wait_time += time.perf_counter() - t0
        if item is self._stop:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class PrefetchLoader:
    """Iterate batches of `batch_size` samples with a prefetch thread."""

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        steps_per_epoch: Optional[int] = None,
        prefetch: int = 2,
        transform: Optional[Callable[[Dict], Dict]] = None,
        seed: int = 42,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.steps = steps_per_epoch or (len(dataset) // batch_size)
        self.prefetch = prefetch
        self.transform = transform
        # per-host stream: offset the seed by the JAX process index so each
        # host of a multi-process mesh draws distinct samples (the per-rank
        # DataLoader behavior, reference src/main.py:147-161); identical to
        # `seed` in single-process runs
        try:
            import jax

            seed = seed + 100_003 * jax.process_index()
        except Exception:
            pass
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return self.steps

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        err: list = []

        def worker():
            try:
                for step in range(self.steps):
                    idxs = [
                        int(self.rng.randint(len(self.dataset)))
                        for _ in range(self.batch_size)
                    ]
                    samples = [self.dataset[i] for i in idxs]
                    if self.transform:
                        samples = [self.transform(s) for s in samples]
                    q.put(collate(samples))
            except BaseException as e:  # re-raise on the CONSUMER side —
                err.append(e)           # a swallowed decode error would
            finally:                    # silently truncate the epoch
                q.put(stop)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                break
            yield item
