"""Host-side input pipeline: infinite sharded sampler + threaded prefetch.

Rebuild of the reference loader stack: ``InfiniteSampler``'s windowed
reshuffle with round-robin shard interleaving (reference:
stylegan2ada/torch_utils/misc.py:109-140) and the thin DataLoader wrapper
(reference: train_parts/dataloaders.py:8-12).  Torch worker *processes*
become worker *threads* here — PIL/zlib decode releases the GIL, and the
TPU step loop only needs the next host batch ready, not torch tensors.

Per-host sharding for multi-host SPMD: each ``jax.process_index()`` passes
its own ``shard``/``num_shards`` (SURVEY §2.6: InfiniteSampler ≙ per-host
sharded pipeline).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

from style_big_gan_tpu.registries import dataloaders


def normalize_images(images: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (reference: trainers.py:716)."""
    return np.asarray(images, np.float32) / 127.5 - 1.0


def infinite_sampler(n: int, shard: int = 0, num_shards: int = 1,
                     shuffle: bool = True, seed: int = 0,
                     window_size: float = 0.5,
                     start_item: int = 0) -> Iterator[int]:
    """Infinite windowed-reshuffle index stream, round-robin sharded
    (same algorithm as reference torch_utils/misc.py:109-140).

    ``start_item`` fast-forwards the stream past its first N yields while
    advancing the reshuffle RNG identically — an exact-resume run replays
    the same index sequence the interrupted run would have produced.
    """
    assert n > 0 and num_shards > 0 and 0 <= shard < num_shards
    order = np.arange(n)
    rnd = None
    window = 0
    if shuffle:
        rnd = np.random.RandomState(seed)
        rnd.shuffle(order)
        window = int(np.rint(order.size * window_size))
    idx = 0
    skip = int(start_item)
    while True:
        i = idx % order.size
        if idx % num_shards == shard:
            if skip > 0:
                skip -= 1
            else:
                yield int(order[i])
        if window >= 2:
            j = (i - rnd.randint(window)) % order.size
            order[i], order[j] = order[j], order[i]
        idx += 1


class _WorkerError:
    """Queue sentinel: a worker's decode/assemble failed.  It still occupies
    that ticket's slot in the delivery order (the C++ pipeline does the same:
    dataio.cpp advances next_push on ok=false) so the other workers never
    deadlock on a dead ticket; the consumer re-raises on receipt."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class _PrefetchIterator:
    """Worker threads pull sampler indices, decode via ``dataset[idx]``, and
    assemble batches into a bounded queue.

    Batches are DELIVERED in sampler order (ticketed: decode runs in
    parallel, the push waits for its turn), so the batch sequence is
    deterministic for any worker count — exact resume depends on it, and
    the reference's torch DataLoader is order-preserving too."""

    def __init__(self, dataset, batch_size: int, sampler: Iterator[int],
                 num_workers: int, prefetch: int):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.sampler = sampler
        self.sampler_lock = threading.Lock()
        self.q: "queue.Queue" = queue.Queue(maxsize=max(1, int(prefetch)))
        self.stop = threading.Event()
        self._next_ticket = 0
        self._next_push = 0
        self._push_cond = threading.Condition()
        self.threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(max(1, int(num_workers)))]
        for t in self.threads:
            t.start()

    def _worker(self) -> None:
        while not self.stop.is_set():
            with self.sampler_lock:
                idxs = [next(self.sampler) for _ in range(self.batch_size)]
                ticket = self._next_ticket
                self._next_ticket += 1
            try:
                imgs, labels = zip(*[self.dataset[i] for i in idxs])
                batch = (np.stack(imgs), np.stack(labels).astype(np.float32))
            except Exception as e:
                # Must still claim this ticket below or every other worker
                # blocks forever waiting for it (advisor r4 finding).
                batch = _WorkerError(e)
            with self._push_cond:
                while not self.stop.is_set() and self._next_push != ticket:
                    self._push_cond.wait(timeout=0.2)
            if self.stop.is_set():
                return
            while not self.stop.is_set():
                try:
                    self.q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue
            with self._push_cond:
                self._next_push += 1
                self._push_cond.notify_all()

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, np.ndarray]:
        item = self.q.get()
        if isinstance(item, _WorkerError):
            raise RuntimeError("dataloader worker failed while decoding a "
                               "batch") from item.exc
        return item

    def close(self) -> None:
        self.stop.set()
        # Drain so workers blocked on put() can observe stop.
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        for t in self.threads:
            t.join(timeout=2.0)


@dataloaders.add_to_registry("basic")
class BasicDataloader:
    """Threaded prefetching loader (reference: train_parts/dataloaders.py:
    8-12 — pin_memory/workers/prefetch knobs map to threads/prefetch)."""

    def __init__(self, num_workers: int = 3, prefetch: int = 2,
                 window_size: float = 0.5):
        self.num_workers = int(num_workers)
        self.prefetch = int(prefetch)
        self.window_size = float(window_size)

    def __call__(self, dataset, batch_size: int, shard: int = 0,
                 num_shards: int = 1, seed: int = 0,
                 shuffle: bool = True,
                 start_item: int = 0) -> Iterator[Tuple[np.ndarray,
                                                        np.ndarray]]:
        sampler = infinite_sampler(len(dataset), shard=shard,
                                   num_shards=num_shards, shuffle=shuffle,
                                   seed=seed, window_size=self.window_size,
                                   start_item=start_item)
        return _PrefetchIterator(dataset, batch_size, sampler,
                                 self.num_workers, self.prefetch)


# Register the native (C++) loader if the shared library is present.
try:
    from style_big_gan_tpu.data import native_loader as _native_loader  # noqa: F401
except Exception:  # pragma: no cover - native lib genuinely absent
    pass
