"""Data loading: index sampling, batching, threaded prefetch, MetaLoader.

Replaces the reference's torch DataLoader machinery (dataset.py:279-330,
620-748, utils/data_sampler.py) with a torch-free pipeline:

* ``ShardedSampler`` — deterministic per-host index shard (the
  DistributedSampler equivalent for jax.process_index/count);
* ``DataLoader`` — thread-pool __getitem__ + background prefetch queue
  (JPEG decode in cv2/PIL releases the GIL, so threads scale);
* ``MetaLoader`` — ratio-weighted multi-task sampling with a *shared seed*
  instead of the reference's broadcast_object_list (dataset.py:702-748):
  every host draws the same task sequence, no collective needed.
"""
from __future__ import annotations

import math
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def default_collate(items: List) -> Dict[str, np.ndarray]:
    """Stack a list of dicts of numpy arrays / scalars."""
    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals, axis=0)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals  # strings / raw objects pass through
    return out


class ShardedSampler:
    """Per-host contiguous-stride shard of shuffled indices.

    Equivalent of torch DistributedSampler (dataset.py:281); pads the index
    list so every host sees the same number of batches.
    """

    def __init__(self, n: int, shuffle: bool, seed: int = 88,
                 rank: int = 0, world: int = 1):
        self.n, self.shuffle, self.seed = n, shuffle, seed
        self.rank, self.world = rank, world
        self.epoch = 0

    def set_epoch(self, ep: int):
        self.epoch = ep

    def indices(self) -> List[int]:
        idx = list(range(self.n))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        per = int(math.ceil(self.n / self.world))
        idx = (idx + idx[: per * self.world - self.n])[
            self.rank * per:(self.rank + 1) * per]
        return idx


class LimitedSampler(ShardedSampler):
    """Cap samples per host per epoch (DistributedSamplerLimited,
    utils/data_sampler.py:13-95)."""

    def __init__(self, n: int, shuffle: bool, limited: int, seed: int = 88,
                 rank: int = 0, world: int = 1):
        super().__init__(n, shuffle, seed, rank, world)
        self.limited = limited

    def indices(self) -> List[int]:
        idx = super().indices()
        return idx[: self.limited] if self.limited > 0 else idx


class NodeSplitSampler(ShardedSampler):
    """Composite-source-aware split: keep each source's rows on one host
    (NodeSplitSampler, utils/data_sampler.py:98-193) so a host touches few
    shard files."""

    def __init__(self, source_idx: Sequence[int], shuffle: bool,
                 seed: int = 88, rank: int = 0, world: int = 1):
        super().__init__(len(source_idx), shuffle, seed, rank, world)
        self.source_idx = list(source_idx)

    def indices(self) -> List[int]:
        import collections
        by_src = collections.defaultdict(list)
        for i, s in enumerate(self.source_idx):
            by_src[s].append(i)
        sources = sorted(by_src)
        rng = random.Random(self.seed + self.epoch)
        if self.shuffle:
            rng.shuffle(sources)
        mine: List[int] = []
        for j, s in enumerate(sources):
            if j % self.world == self.rank:
                rows = by_src[s]
                if self.shuffle:
                    rng.shuffle(rows)
                mine.extend(rows)
        return mine


class IterationBasedBatchIter:
    """Wraps batch iteration to run a fixed number of iterations, cycling
    epochs (IterationBasedBatchSampler, utils/data_sampler.py:196-222)."""

    def __init__(self, loader: "DataLoader", num_iters: int,
                 start_iter: int = 0):
        self.loader = loader
        self.num_iters = num_iters
        self.iteration = start_iter

    def __len__(self):
        return self.num_iters

    def __iter__(self):
        ep = 0
        while self.iteration < self.num_iters:
            self.loader.set_epoch(ep)
            for batch in self.loader:
                if self.iteration >= self.num_iters:
                    return
                self.iteration += 1
                yield batch
            ep += 1


class DataLoader:
    """Minimal threaded batch loader over a map-style dataset."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 num_workers: int = 4, drop_last: bool = False,
                 collate_fn: Optional[Callable] = None, seed: int = 88,
                 rank: int = 0, world: int = 1, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.collate = collate_fn or getattr(
            dataset, "collate_batch", default_collate)
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.sampler = ShardedSampler(
            len(dataset), shuffle, seed, rank, world)

    def set_epoch(self, ep: int):
        self.sampler.set_epoch(ep)

    def __len__(self):
        n = len(self.sampler.indices())
        if self.drop_last:
            # a corpus smaller than one batch still yields ONE wrapped
            # batch (torch DistributedSampler pads indices to even) so
            # tiny datasets never train zero steps under a large mesh
            return max(1, n // self.batch_size) if n else 0
        return int(math.ceil(n / self.batch_size))

    def _batches(self) -> List[List[int]]:
        idx = self.sampler.indices()
        if self.drop_last and idx and len(idx) < self.batch_size:
            reps = int(math.ceil(self.batch_size / len(idx)))
            idx = (idx * reps)[: self.batch_size]
        batches = [idx[i:i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            with ThreadPoolExecutor(self.num_workers) as pool:
                for b in batches:
                    if stop.is_set():
                        return
                    items = list(pool.map(self.dataset.__getitem__, b))
                    q.put(self.collate(items))
            q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def device_prefetch(iterator, to_device: Callable, depth: int = 2):
    """Overlap host batch prep with device compute: keep `depth` batches
    already transferred (uint8 frames -> normalized on device) ahead of the
    consumer.  JAX dispatch is async, so simply staying ahead of the
    consumer pipeline keeps the chip fed.
    """
    import collections
    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(depth):
            buf.append(to_device(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(to_device(next(it)))
        except StopIteration:
            pass
        yield out


class MetaLoader:
    """Infinite ratio-weighted multi-task iterator (dataset.py:702-748).

    The reference broadcasts rank-0's task choice every step; here every
    host draws from the same seeded RNG, so all hosts agree with zero
    communication.
    """

    def __init__(self, loaders: Dict[str, "DataLoader"],
                 ratios: Optional[Dict[str, int]] = None,
                 accum_steps: int = 1, seed: int = 88):
        self.name2loader = dict(loaders)
        self.pool: List[str] = []
        for name in loaders:
            r = (ratios or {}).get(name, 1)
            self.pool.extend([name] * int(r))
        self.accum_steps = accum_steps
        self.rng = random.Random(seed)
        self.name2iter = {n: iter(l) for n, l in self.name2loader.items()}
        self.step = 0

    def __iter__(self):
        task = self.pool[0]
        while True:
            if self.step % self.accum_steps == 0:
                task = self.rng.choice(self.pool)
            self.step += 1
            it = self.name2iter[task]
            try:
                batch = next(it)
            except StopIteration:
                it = iter(self.name2loader[task])
                self.name2iter[task] = it
                batch = next(it)
            yield task, batch
