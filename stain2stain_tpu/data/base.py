"""Data pipeline base: datasets, threaded prefetching loader, DataModule.

TPU-first re-design of the reference's torch DataLoader pipeline
(/root/reference/src/data/paired_data_module.py:225-353):

- **Host does decode only.** Datasets return uint8 (or raw label) numpy
  arrays; normalization and paired augmentation run *on device* inside the
  jitted train step (see stain2stain_tpu.ops.image), so batches stream to HBM
  once and never round-trip.
- **Threaded prefetch instead of worker processes.** Image decode releases the
  GIL (libjpeg/libpng under cv2/PIL), so a thread pool + bounded prefetch
  queue replaces torch's multiprocessing workers (``num_workers`` maps to
  threads; ``prefetch_factor`` batches are kept in flight).
- **Global-batch semantics preserved**: ``batch_size`` is the *global* batch;
  each host process loads ``batch_size // jax.process_count()`` examples
  (ref: paired_data_module.py:272-278), sharded by example index.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np


class Dataset:
    """Minimal map-style dataset protocol."""

    def __len__(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, idx: int) -> tuple:  # pragma: no cover - interface
        raise NotImplementedError


class ConcatDataset(Dataset):
    """Concatenation of datasets (torch ConcatDataset equivalent, used by the
    pos/neg mixing pipeline, ref: paired_postive_negative_data_he_amyloid.py:256)."""

    def __init__(self, datasets: Sequence[Dataset]):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def set_epoch(self, epoch: int) -> None:
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int) -> tuple:
        ds_idx = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[ds_idx][idx - int(self._offsets[ds_idx])]


def default_collate(samples: list[tuple]) -> tuple:
    """Stack a list of per-example tuples into a tuple of batched arrays."""
    first = samples[0]
    out = []
    for i, field in enumerate(first):
        vals = [s[i] for s in samples]
        if isinstance(field, np.ndarray):
            out.append(np.ascontiguousarray(np.stack(vals)))
        elif isinstance(field, (int, np.integer)):
            out.append(np.asarray(vals, dtype=np.int32))
        elif isinstance(field, (float, np.floating)):
            out.append(np.asarray(vals, dtype=np.float32))
        else:
            out.append(vals)  # strings (filenames) stay a list
    return tuple(out)


class DataLoader:
    """Threaded, prefetching, optionally shuffled batch loader.

    Deterministic under ``seed``: epoch ``e`` uses permutation seed
    ``seed + e`` (call :meth:`set_epoch` like a torch DistributedSampler).
    ``shard_index``/``num_shards`` select this process's slice of each batch.
    """

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        prefetch_factor: int = 2,
        seed: int = 0,
        collate_fn: Callable = default_collate,
        sampler_weights: Optional[np.ndarray] = None,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        if batch_size % num_shards != 0:
            raise ValueError(
                f"Global batch size {batch_size} must be divisible by process count {num_shards}"
            )
        self.dataset = dataset
        self.global_batch_size = batch_size
        self.batch_size = batch_size // num_shards
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch_factor = max(1, prefetch_factor)
        self.seed = seed
        self.collate_fn = collate_fn
        self.sampler_weights = sampler_weights
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._epoch = 0
        self._pool = None
        self._pool_lock = threading.Lock()
        if drop_last and 0 < len(dataset) < batch_size:
            # would silently yield ZERO batches and crash the trainer with a
            # bare StopIteration at the first next(iter(loader))
            raise ValueError(
                f"dataset has {len(dataset)} examples but the global batch "
                f"size is {batch_size} with drop_last=True - no full batch "
                "can ever be formed (reduce batch_size or add data)"
            )

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        # Propagate to datasets with per-epoch sampling state (e.g. the
        # any2any dataset's per-item domain draws).
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.sampler_weights is not None:
            # WeightedRandomSampler equivalent: sample-with-replacement by weight
            p = np.asarray(self.sampler_weights, dtype=np.float64)
            p = p / p.sum()
            return rng.choice(n, size=n, replace=True, p=p)
        if self.shuffle:
            return rng.permutation(n)
        return np.arange(n)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return -(-n // self.global_batch_size)

    def real_batch_size(self, b: int) -> int:
        """True (pre-padding) number of distinct examples in global batch ``b``
        — the weight an example-weighted eval mean should give that batch.
        Host-shard and device padding duplicate examples (see __iter__ and
        Trainer._device_batch); those duplicates must not inflate the count."""
        n = len(self.dataset)
        if self.drop_last:
            return self.global_batch_size
        return max(1, min(self.global_batch_size, n - b * self.global_batch_size))

    def _local_batches(self) -> list[np.ndarray]:
        """This process's per-batch index arrays for the current epoch —
        the single source of ordering/sharding truth, shared with the
        device-cached loader so both yield identical example streams."""
        indices = self._epoch_indices()
        batches: list[np.ndarray] = []
        for b in range(len(self)):
            chunk = indices[b * self.global_batch_size : (b + 1) * self.global_batch_size]
            if self.num_shards > 1 and len(chunk) % self.num_shards:
                # Ragged final global batch (eval, drop_last=False): pad to a
                # multiple of the process count by repeating leading indices
                # so every host gets an equal local batch —
                # make_array_from_process_local_data requires it (same
                # duplication semantics as the trainer's device padding).
                pad = self.num_shards - len(chunk) % self.num_shards
                chunk = np.concatenate([chunk, chunk[np.arange(pad) % len(chunk)]])
            # This process's shard of the global batch.
            batches.append(chunk[self.shard_index :: self.num_shards])
        return batches

    def __iter__(self) -> Iterator[tuple]:
        batches = self._local_batches()

        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch_factor)
        stop = threading.Event()

        get_batch = getattr(self.dataset, "get_batch", None)

        def bounded_put(item) -> bool:
            # A consumer that exits the epoch early (limit_train_batches,
            # max_steps, fast_dev_run) never drains the queue; a plain
            # blocking put would park this thread forever on a full queue.
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for local in batches:
                    if stop.is_set():
                        return
                    # Native fast path: one GIL-free C++ call decodes the whole
                    # batch (returns None when the native lib is unavailable).
                    batch = get_batch(local) if get_batch is not None else None
                    if batch is None:
                        if self.num_workers > 1 and len(local) > 1:
                            samples = list(self._parallel_fetch(local))
                        else:
                            samples = [self.dataset[int(i)] for i in local]
                        batch = self.collate_fn(samples)
                    if not bounded_put(batch):
                        return
                bounded_put(None)
            except BaseException as e:  # surface worker errors to the consumer
                bounded_put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _parallel_fetch(self, idxs: np.ndarray) -> list:
        from concurrent.futures import ThreadPoolExecutor

        if self._pool is None:
            # Two producers can race here (the trainer peeks one batch from a
            # throwaway iterator before the epoch loop starts a second one) —
            # without the lock both would create an executor and one leaks.
            with self._pool_lock:
                if self._pool is None:
                    self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        return list(self._pool.map(lambda i: self.dataset[int(i)], idxs))

    def __del__(self):
        pool = getattr(self, "_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)


class DataModule:
    """Lightning-DataModule-shaped base: prepare/setup/loaders contract
    (ref interface: paired_data_module.py:225-353)."""

    def prepare_data(self) -> None:  # one-time, process-0 side effects
        pass

    def setup(self, stage: Optional[str] = None) -> None:
        pass

    def train_dataloader(self) -> Optional[DataLoader]:
        return None

    def val_dataloader(self) -> Optional[DataLoader]:
        return None

    def test_dataloader(self) -> Optional[DataLoader]:
        return None

    def teardown(self, stage: Optional[str] = None) -> None:
        pass

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


__all__ = ["Dataset", "ConcatDataset", "DataLoader", "DataModule", "default_collate"]
