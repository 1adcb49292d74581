"""Host-side async input pipeline: overlap I/O/voxelize with device work.

The reference overlaps host work with GPU compute via torch DataLoader
worker processes (10 workers in feature extraction,
``YOHO_testset.py:174-176``; 16 in training, ``parses_partI.py:52-53``).
The TPU-native equivalent is a small thread-pool prefetcher: host prep
(PLY read, C++ prevoxelize, padding — all GIL-releasing) for item i+1
runs while the device executes item i. Threads suffice because the
heavy host steps release the GIL (ctypes native voxelizer, numpy).

``wait_s`` on the iterator accumulates time the consumer blocked on
host prep — the "device idle" metric; near-zero means the pipeline is
device-bound, as it should be.
"""

from __future__ import annotations

import itertools
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from time import perf_counter
from typing import Callable, Iterable, Iterator, TypeVar

K = TypeVar("K")
V = TypeVar("V")


class PrefetchIterator(Iterator):
    """Iterator over ``(key, prepare(key))`` with ``depth`` items
    prepared ahead by ``workers`` background threads."""

    def __init__(
        self,
        prepare: Callable[[K], V],
        keys: Iterable[K],
        depth: int = 2,
        workers: int = 2,
    ):
        self._ex = ThreadPoolExecutor(max_workers=workers)
        self._keys = iter(keys)
        self._q: deque = deque()
        self._prepare = prepare
        self.wait_s = 0.0  # time the consumer blocked on host prep
        for k in itertools.islice(self._keys, max(depth, 1)):
            self._q.append((k, self._ex.submit(prepare, k)))

    def __iter__(self):
        return self

    def __next__(self):
        if not self._q:
            self._ex.shutdown(wait=False)
            raise StopIteration
        k, fut = self._q.popleft()
        t0 = perf_counter()
        v = fut.result()
        self.wait_s += perf_counter() - t0
        try:
            nk = next(self._keys)
            self._q.append((nk, self._ex.submit(self._prepare, nk)))
        except StopIteration:
            pass
        return k, v


def prefetch(prepare, keys, depth: int = 2, workers: int = 2) -> PrefetchIterator:
    return PrefetchIterator(prepare, keys, depth, workers)
