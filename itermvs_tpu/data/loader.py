"""Host-side batching / prefetching loader (replaces torch DataLoader).

The reference drives training through `torch.utils.data.DataLoader`
with 4 worker processes (train.py:89-90). Here: a thread-pool loader —
cv2 / PIL / numpy release the GIL for the heavy decode+resize work, so
threads deliver near-linear speedups without fork overhead — plus an
optional PROCESS pool for `__getitem__` (worker_processes > 0): on
multi-core hosts the PNG/PFM decode + resize is CPU-bound Python/C
round-tripping that a single core caps at ~5 items/s (measured
~186 ms/item on the DTU recipe, docs/PERFORMANCE.md), so real decode
parallelism needs processes, exactly like the reference's
num_workers=4. Collate stays on the main thread either way. A
device-prefetch wrapper keeps one batch in flight to overlap host IO
with TPU compute.
"""
from __future__ import annotations

import collections
import multiprocessing
import queue
import sys
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

# Worker-process state (one dataset per worker, installed by the pool
# initializer — avoids re-pickling the dataset per item).
_WORKER_DATASET = None


def _init_worker(dataset, epoch, n_workers):
    global _WORKER_DATASET
    _WORKER_DATASET = dataset
    if hasattr(dataset, "set_epoch"):
        dataset.set_epoch(epoch)
    # Each forked worker holds its own decode LRU; split the configured
    # budget so the aggregate stays at ITERMVS_DECODE_CACHE_MB.
    from itermvs_tpu.data.base import split_decode_cache_cap

    split_decode_cache_cap(n_workers)


def _worker_get(idx):
    return _WORKER_DATASET[int(idx)]


def collate(samples: list):
    """Recursively stack a list of samples (dicts / arrays / scalars)."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: collate([s[k] for s in samples]) for k in first}
    if isinstance(first, np.ndarray):
        return np.stack(samples)
    if isinstance(first, (np.floating, float)):
        return np.asarray(samples, dtype=np.float32)
    if isinstance(first, (np.integer, int)):
        return np.asarray(samples, dtype=np.int64)
    if isinstance(first, str):
        return list(samples)
    raise TypeError(f"cannot collate type {type(first)}")


class DataLoader:
    """Iterable over batched samples with threaded prefetch.

    Args mirror the reference's DataLoader call sites: batch_size,
    shuffle, num_workers, drop_last. `seed` controls shuffle order.
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=4,
                 drop_last=False, seed=0, prefetch_batches=2,
                 process_index=0, process_count=1, worker_processes=0):
        """`batch_size` is the GLOBAL batch. Under a multi-host launch
        (process_count > 1) each process loads only its contiguous
        1/process_count slice of every global batch; all processes share
        the same (seed, epoch)-keyed shuffle order, so the slices
        partition each global batch exactly (the per-host half of
        parallel/mesh.py:shard_batch)."""
        if batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{process_count} processes")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch_batches = prefetch_batches
        # worker_processes > 0: decode items in that many OS processes
        # (fork start method: workers inherit the dataset's open state
        # cheaply and never touch JAX/TPU — they only run numpy/cv2/PIL;
        # identical samples to thread mode since per-item RNG is a pure
        # function of (seed, epoch, idx), data/base.py:item_rng).
        self.worker_processes = int(worker_processes)
        if self.worker_processes > 0 and sys.platform != "linux":
            # Fork is only safe on Linux: by first __iter__ the parent
            # already holds live threads (writer pools, PJRT) and on
            # macOS fork()+PIL/cv2 after Objective-C runtime init
            # aborts; spawn would re-import __main__ (the CLIs run work
            # at module scope) — fall back to threads elsewhere.
            self.worker_processes = 0
        self._epoch = 0
        self._skip = 0

    def set_epoch(self, epoch: int, skip_batches: int = 0):
        """Pin the next iteration's shuffle order to `epoch` and skip its
        first `skip_batches` batches — the loader half of step-granularity
        resume (shuffle order is a pure function of (seed, epoch), so a
        restarted run regenerates the identical batch sequence)."""
        self._epoch = int(epoch)
        self._skip = int(skip_batches)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last or self.process_count > 1:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        batches = []
        local = self.batch_size // self.process_count
        for start in range(0, len(order), self.batch_size):
            chunk = order[start:start + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                if self.process_count > 1:
                    # Multi-host requires full global batches: every
                    # process must contribute an equal local slice.
                    continue
            if self.process_count > 1:
                chunk = chunk[self.process_index * local:
                              (self.process_index + 1) * local]
            batches.append(chunk)
        return batches

    def __iter__(self):
        # Let datasets with per-item RNG vary augmentation across epochs
        # while staying reproducible under threaded workers.
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        epoch = self._epoch
        batches = self._batch_indices()[self._skip:]
        self._epoch += 1
        self._skip = 0
        if not batches:
            return

        if self.worker_processes > 0:
            # One pool per epoch: the initializer installs the dataset
            # (pickled once per worker) pinned to this epoch's RNG.
            pool = ProcessPoolExecutor(
                max_workers=self.worker_processes,
                mp_context=multiprocessing.get_context("fork"),
                initializer=_init_worker,
                initargs=(self.dataset, epoch, self.worker_processes))
            get = _worker_get
        else:
            pool = ThreadPoolExecutor(max_workers=self.num_workers)
            get = self.dataset.__getitem__

        with pool:
            depth = self.prefetch_batches + 1
            pending = collections.deque()

            def submit(batch):
                return [pool.submit(get, int(i)) for i in batch]

            for batch in batches[:depth]:
                pending.append(submit(batch))
            next_to_submit = depth

            while pending:
                futures = pending.popleft()
                if next_to_submit < len(batches):
                    pending.append(submit(batches[next_to_submit]))
                    next_to_submit += 1
                yield collate([f.result() for f in futures])


def prefetch_to_device(iterator, size: int = 2, device=None):
    """Move batches to device ahead of consumption (double buffering)."""
    import jax

    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for batch in iterator:
                q.put(jax.device_put(batch, device))
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        yield item
