"""Batched, threaded data loader with device prefetch (replaces
torch.utils.data.DataLoader at reference train/train.py:56-57).

TPU-first design:
- host-side decode/augment runs in a thread pool (PIL releases the GIL in
  decode/resize), producing fixed-shape NHWC float32 batches;
- ``prefetch_to_device`` keeps ``size`` batches resident on the chip so the
  input pipeline overlaps with the jitted step (the torch equivalent is
  pin_memory + non_blocking copies; on TPU it's simply an eager
  ``jax.device_put`` queue).
"""

from __future__ import annotations

import collections
import concurrent.futures
import threading
from typing import Iterator, Optional

import numpy as np


class DataLoader:
    """Map-style loader: shuffling, batching, optional parallel decode.

    Yields ``(batch_x, batch_y)`` numpy arrays. Deterministic given
    ``seed`` (reshuffled per epoch by ``epoch`` in ``set_epoch``).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 0, drop_last: bool = False, seed: int = 0,
                 shard: Optional[tuple] = None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = int(num_workers)
        self.drop_last = drop_last
        self.seed = seed
        # Multi-host data parallelism: ``shard=(rank, world)`` makes this
        # process load only its 1/world of every epoch (torch
        # DistributedSampler semantics: the SAME seeded global shuffle on
        # every host, wrap-padded to a multiple of world, then strided by
        # rank — shards are disjoint, their union covers the epoch, and
        # per-host streams stay deterministic). ``batch_size`` stays the
        # PER-HOST size; pair with rank = jax.process_index(),
        # world = jax.process_count() on a pod.
        if shard is not None:
            rank, world = int(shard[0]), int(shard[1])
            if not 0 <= rank < world:
                raise ValueError(f"shard rank {rank} not in [0, {world})")
            shard = (rank, world)
        self.shard = shard
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.shard is not None:
            n = -(-n // self.shard[1])  # wrap-padded shard size
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng((self.seed, self._epoch))
            rng.shuffle(idx)
        if self.shard is not None:
            rank, world = self.shard
            pad = (-len(idx)) % world
            if pad:  # wrap-pad so every rank sees the same count
                idx = np.concatenate([idx, idx[:pad]])
            idx = idx[rank::world]
        return idx

    def _collate(self, items):
        xs, ys = zip(*items)
        return (
            np.stack([np.asarray(x, dtype=np.float32) for x in xs]),
            np.asarray(ys, dtype=np.int32),
        )

    def __iter__(self) -> Iterator:
        idx = self._indices()
        n_batches = len(self)
        batches = [
            idx[i * self.batch_size:(i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        # C++ whole-batch fast path (ImageFolder + standard eval transform):
        # decode threads live in native code, one GIL release per batch
        native_fn = getattr(self.dataset, "native_batch", None)
        if native_fn is not None and self.num_workers > 0:
            probe = native_fn(batches[0][:1], num_threads=1) if batches else None
            if probe is not None:
                def fetch_native(b):
                    x, y = native_fn(b, num_threads=self.num_workers)
                    return x, y.astype(np.int32)

                yield from self._pipelined(batches, fetch_native, workers=2)
                return
        if self.num_workers <= 0:
            for b in batches:
                yield self._collate([self.dataset[int(i)] for i in b])
            return

        def fetch(b):
            return self._collate([self.dataset[int(i)] for i in b])

        yield from self._pipelined(batches, fetch, workers=self.num_workers)

    def _pipelined(self, batches, fetch, workers: int):
        """Run ``fetch`` over batches in a thread pool, keeping 2*workers
        batches in flight, preserving order."""
        pool = concurrent.futures.ThreadPoolExecutor(workers)
        try:
            pending = collections.deque()
            it = iter(batches)
            for b in it:
                pending.append(pool.submit(fetch, b))
                if len(pending) >= 2 * workers:
                    break
            for b in it:
                yield pending.popleft().result()
                pending.append(pool.submit(fetch, b))
            while pending:
                yield pending.popleft().result()
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def prefetch_to_device(iterator, size: int = 2, sharding=None):
    """Wrap a host batch iterator so ``size`` batches are already on device
    (optionally with a ``NamedSharding`` for multi-chip data parallelism)."""
    import jax

    def put(batch):
        if sharding is not None:
            return jax.tree.map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return jax.tree.map(jax.device_put, batch)

    queue = collections.deque()
    it = iter(iterator)
    for item in it:
        queue.append(put(item))
        if len(queue) == size:
            break
    for item in it:
        yield queue.popleft()
        queue.append(put(item))
    while queue:
        yield queue.popleft()


class BackgroundIterator:
    """Run an iterator in a daemon thread with a bounded queue — used to
    overlap host augmentation with device steps across epochs."""

    _SENTINEL = object()

    def __init__(self, iterator, maxsize: int = 4):
        import queue as _q

        self._q = _q.Queue(maxsize=maxsize)
        self._thread = threading.Thread(
            target=self._fill, args=(iterator,), daemon=True
        )
        self._err: Optional[BaseException] = None
        self._thread.start()

    def _fill(self, iterator):
        try:
            for item in iterator:
                self._q.put(item)
        except BaseException as e:  # surfaced on next()
            self._err = e
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
