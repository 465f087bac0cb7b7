"""Input pipeline: multi-host sharding, worker pool, host prefetch.

Replaces the reference's single-worker torch DataLoader
(/root/reference/train.py:55-58 — a known throughput ceiling, SURVEY §3.5)
with a thread pool doing text+mel extraction and a double-buffered
prefetcher so the host assembles batch N+1 while the device runs batch N.
Multi-host: each process takes a strided slice of the dataset, the
equivalent of torch's DistributedSampler (train.py:49,126).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np

import jax

from tacotron2_tpu.config import Tacotron2Config
from tacotron2_tpu.data.bucketing import BucketSampler, pad_batch
from tacotron2_tpu.data.dataset import TextMelDataset
from tacotron2_tpu.training.state import Batch


class DataPipeline:
    """Epoch iterator producing padded, bucketed ``Batch`` pytrees."""

    def __init__(self, dataset: TextMelDataset, config: Tacotron2Config,
                 batch_size: Optional[int] = None, drop_last: bool = True,
                 num_workers: int = 8,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.config = config
        self.num_workers = num_workers
        pi = jax.process_index() if process_index is None else process_index
        pc = jax.process_count() if process_count is None else process_count
        # strided per-host shard of the (already seed-shuffled) dataset
        self.indices = list(range(pi, len(dataset), pc))

        # Length metadata for bucketing: text length from encoding, mel
        # length from the WAV header sample count (1 + n // hop) — no audio
        # is decoded during this pass. Computed lazily, cached.
        self._lengths: Optional[List[Tuple[int, int]]] = None
        self.batch_size = batch_size or config.batch_size
        self.drop_last = drop_last

    def _compute_lengths(self) -> List[Tuple[int, int]]:
        from tacotron2_tpu.data.dataset import item_lengths

        def one(i):
            return item_lengths(self.dataset.entries[i], self.config)
        with ThreadPoolExecutor(self.num_workers) as pool:
            return list(pool.map(one, self.indices))

    @property
    def lengths(self) -> List[Tuple[int, int]]:
        if self._lengths is None:
            self._lengths = self._compute_lengths()
        return self._lengths

    def epoch(self, epoch_index: int) -> Iterator[Batch]:
        """Deterministically shuffled epoch of padded batches."""
        sampler = BucketSampler(self.lengths, self.config, self.batch_size,
                                self.drop_last)
        rng = np.random.RandomState(self.config.seed + epoch_index)
        pool = self._pool()

        def assemble(shape_and_items):
            (t_text, t_mel), item_idxs = shape_and_items
            n_real = len(item_idxs)
            if n_real < self.batch_size:
                # pad partial (non-drop_last) batches to the full batch size
                # by cycling items: keeps one compile shape per bucket and a
                # dp-divisible batch dimension. The cycled duplicates are
                # marked invalid in row_valid so the validation loss can
                # weight them out (training/loss.py).
                reps = -(-self.batch_size // n_real)
                item_idxs = (item_idxs * reps)[:self.batch_size]
            items = list(pool.map(
                lambda j: self.dataset[self.indices[j]], item_idxs))
            arrays = pad_batch(items, t_text, t_mel,
                               self.config.n_frames_per_step)
            row_valid = np.zeros((len(item_idxs),), np.float32)
            row_valid[:n_real] = 1.0
            return Batch(*arrays, row_valid=row_valid)

        for shape_and_items in sampler.batches(rng):
            yield assemble(shape_and_items)

    def _pool(self) -> ThreadPoolExecutor:
        """Persistent worker pool (one per pipeline, lazily created)."""
        pool = getattr(self, "_worker_pool", None)
        if pool is None:
            pool = ThreadPoolExecutor(self.num_workers)
            self._worker_pool = pool
        return pool

    def steps_per_epoch(self) -> int:
        sampler = BucketSampler(self.lengths, self.config, self.batch_size,
                                self.drop_last)
        return sum(1 for _ in sampler.batches(np.random.RandomState(0)))


def prefetch(iterator: Iterator, depth: int = 2,
             transfer=None) -> Iterator:
    """Run ``iterator`` in a background thread, keeping ``depth`` items
    ready — overlaps host batch assembly with device compute.

    ``transfer``: optional callable applied to each item in the PRODUCER
    thread, e.g. ``lambda b: jax.device_put(b, sharding)`` — starts the
    host->device copy of batch N+1 while the device runs batch N, so the
    jitted step never waits on H2D (the reference's ``to_gpu`` with
    non_blocking=True, utils.py:24-29, done one batch ahead)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    error: List[BaseException] = []

    def producer():
        try:
            for item in iterator:
                q.put(item if transfer is None else transfer(item))
        except BaseException as e:  # propagate worker failures to consumer
            error.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            return
        yield item
