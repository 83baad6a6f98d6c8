"""Input pipeline: threaded host prefetch + device staging.

The reference relies on torch DataLoader worker processes
(voxelnet/train.py:77-93). TPU-native equivalent: a bounded
producer/consumer pipeline that overlaps host-side example assembly
(file IO, label parsing, padding, optional augmentation) with device
compute, and stages the next batch onto the device while the current
step runs.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Callable, Iterator

import numpy as np


class PrefetchIterator:
    """Run a source iterator in one background thread, keeping up to
    `depth` items ready — overlaps host batch assembly with device steps
    while preserving order."""

    _DONE = object()

    def __init__(self, make_iterator: Callable[[], Iterator[dict]],
                 depth: int = 4):
        self._queue: queue.Queue = queue.Queue(maxsize=depth)
        self._error = None
        self._thread = threading.Thread(
            target=self._produce, args=(make_iterator(),), daemon=True)
        self._thread.start()

    def _produce(self, source):
        try:
            for item in source:
                self._queue.put(item)
        except Exception as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._queue.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._DONE:
            if self._error is not None:
                raise self._error
            raise StopIteration
        return item


class LazyBatchIterator:
    """Assemble batches lazily in background threads, in deterministic order.

    Unlike PrefetchIterator over a finished iterator, this distributes the
    per-example work (file IO, voxelization when host_voxelize, padding)
    across `workers` threads — numpy releases the GIL for the heavy parts.
    Workers tag each batch with its sequence number and the consumer
    reorders, so two runs with any worker count see the same batch stream
    (run-level reproducibility on top of the per-(item, epoch) example RNG).
    """

    _DONE = object()

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, workers: int = 4, depth: int = 8,
                 drop_remainder: bool = True,
                 transform: Callable[[dict], dict] | None = None,
                 process_shard: tuple[int, int] | None = None):
        from voxelnet_tpu.data.dataset import collate, plan_batches

        self._transform = transform
        # the SAME plan (shuffle, cyclic tail wrap, per-host row block)
        # as the synchronous iterator — see dataset.plan_batches
        chunks = [
            idxs for idxs, _ in plan_batches(
                len(dataset), batch_size, shuffle, seed, drop_remainder,
                process_shard)
        ]

        self._collate = collate
        self._dataset = dataset
        self._work: queue.Queue = queue.Queue()
        self._out: queue.Queue = queue.Queue(maxsize=depth)
        self._error = None
        for seq, c in enumerate(chunks):
            self._work.put((seq, c))
        workers = max(1, min(workers, len(chunks) or 1))
        for _ in range(workers):
            self._work.put(self._DONE)
        self._threads = [threading.Thread(target=self._worker, daemon=True)
                         for _ in range(workers)]
        for t in self._threads:
            t.start()
        self._live = workers
        self._next_seq = 0
        self._pending: dict[int, dict] = {}

    def _worker(self):
        try:
            while True:
                item = self._work.get()
                if item is self._DONE:
                    break
                seq, idxs = item
                batch = self._collate(
                    [self._dataset[int(i)] for i in idxs])
                if self._transform is not None:
                    batch = self._transform(batch)
                self._out.put((seq, batch))
        except Exception as e:
            self._error = e
        finally:
            self._out.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        # Drain completions into the reorder buffer until the next batch in
        # sequence is available. The buffer is consumer-side and unbounded,
        # so workers never block on out-of-order completions (no deadlock
        # against the bounded output queue).
        while True:
            if self._next_seq in self._pending:
                batch = self._pending.pop(self._next_seq)
                self._next_seq += 1
                return batch
            if self._live <= 0:
                if self._error is not None:
                    raise self._error
                raise StopIteration
            item = self._out.get()
            if item is self._DONE:
                self._live -= 1
                if self._error is not None:
                    # fail fast: drain the work queue so surviving
                    # workers exit instead of loading (and buffering,
                    # unbounded) the rest of the epoch behind the error
                    try:
                        while True:
                            self._work.get_nowait()
                    except queue.Empty:
                        pass
                    for _ in range(self._live):
                        self._work.put(self._DONE)  # release blocked peers
                    # a worker blocked on the full bounded _out queue
                    # never reaches _work.get(); keep draining _out until
                    # each thread exits (every drained slot unblocks one
                    # put — including the finally-clause _DONE put).
                    # Bounded wait: a worker wedged in dataset IO stays a
                    # daemon thread, as before.
                    deadline = time.monotonic() + 5.0
                    for t in self._threads:
                        while t.is_alive() and time.monotonic() < deadline:
                            try:
                                self._out.get(timeout=0.05)
                            except queue.Empty:
                                pass
                            t.join(timeout=0.02)
                    raise self._error
                continue
            seq, batch = item
            self._pending[seq] = batch
