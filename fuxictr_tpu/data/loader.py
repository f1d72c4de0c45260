"""Host-side batch iterators feeding the jitted train/eval steps.

Design (vs reference /root/reference/fuxictr/pytorch/dataloaders/*):
  - Fixed-shape batches: the final partial batch is padded up to
    ``batch_size`` and a float mask column (:data:`SAMPLE_MASK_KEY`) marks
    valid rows, so every step hits the same compiled executable.
  - In-memory loader = vectorized ndarray slicing, no worker processes.
  - Streaming loader = iterates sorted part files with a background
    prefetch thread (double buffering) instead of torch DataPipes.
"""

import collections
import itertools
import logging

import numpy as np

from fuxictr_tpu.data.array_dataset import (SAMPLE_MASK_KEY, expand_path,
                                            load_columns)


def _pad_batch(arrays, batch_size):
    """Pad every array in the dict to ``batch_size`` rows; returns mask."""
    n = len(next(iter(arrays.values())))
    mask = np.ones(batch_size, dtype=np.float32)
    if n == batch_size:
        return arrays, mask
    mask[n:] = 0.0
    padded = {}
    for k, v in arrays.items():
        pad_width = [(0, batch_size - n)] + [(0, 0)] * (v.ndim - 1)
        padded[k] = np.pad(v, pad_width)
    return padded, mask


class _BaseLoader:
    """Common surface: len() = number of batches; iteration yields dicts."""

    num_samples = 0
    num_blocks = 1
    num_batches = 0

    def __len__(self):
        return self.num_batches


class InMemoryDataLoader(_BaseLoader):
    """Whole-split-in-RAM loader with per-epoch vectorized shuffling.

    Multi-host (``num_hosts > 1``): each process keeps only a contiguous
    ``ceil(N/num_hosts)``-row block, zero-padded so every host yields the
    SAME batch count (jitted steps are collective in multi-process runs —
    unequal counts would deadlock); padded rows carry mask 0.
    """

    def __init__(self, feature_map, data_path, split="train", batch_size=32,
                 shuffle=False, seed=2019, host_id=0, num_hosts=1, **kwargs):
        self.feature_map = feature_map
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0
        parts = expand_path(data_path)
        cols = [load_columns(feature_map, p) for p in parts]
        if len(cols) == 1:
            self.columns = cols[0]
        else:
            self.columns = {k: np.concatenate([c[k] for c in cols])
                            for k in cols[0]}
        total = len(next(iter(self.columns.values())))
        self._n_rows = total
        self._row_mask = None
        if num_hosts > 1:
            per = int(np.ceil(total / num_hosts))
            lo = host_id * per
            hi = min(lo + per, total)
            self.columns = {k: v[lo:hi] for k, v in self.columns.items()}
            n_local = max(hi - lo, 0)
            if n_local < per:
                self.columns = {
                    k: np.concatenate(
                        [v, np.zeros((per - n_local,) + v.shape[1:],
                                     v.dtype)])
                    for k, v in self.columns.items()}
                self._row_mask = np.zeros(per, np.float32)
                self._row_mask[:n_local] = 1.0
            self._n_rows = per
        self.num_samples = total
        self.num_blocks = 1
        self.num_batches = int(np.ceil(self._n_rows / batch_size))

    def __iter__(self):
        order = np.arange(self._n_rows)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        bs = self.batch_size
        for start in range(0, self._n_rows, bs):
            idx = order[start:start + bs]
            batch = {k: v[idx] for k, v in self.columns.items()}
            batch, mask = _pad_batch(batch, bs)
            if self._row_mask is not None:
                mask = mask.copy()
                mask[:len(idx)] *= self._row_mask[idx]
            batch[SAMPLE_MASK_KEY] = mask
            yield batch


class BlockStreamingDataLoader(_BaseLoader):
    """Streams part files; shuffles within a buffer; prefetches next block.

    Capability-parity with the reference's Parquet/NpzBlockDataLoader
    (per-worker block sharding generalizes here to per-host sharding via
    ``host_id``/``num_hosts`` for multi-host input pipelines).
    """

    def __init__(self, feature_map, data_path, split="train", batch_size=32,
                 shuffle=False, seed=2019, buffer_size=100000,
                 host_id=0, num_hosts=1, **kwargs):
        self.feature_map = feature_map
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.buffer_size = max(buffer_size, batch_size)
        self._epoch = 0
        parts = expand_path(data_path)
        if not parts:
            raise ValueError(f"no data parts found at {data_path}")
        self.parts = [p for i, p in enumerate(parts)
                      if i % num_hosts == host_id]
        self._schema_part = parts[0]    # for zero-batch templates
        self.num_blocks = max(len(self.parts), 1)
        self.num_samples = sum(self._count_rows(p) for p in self.parts)
        self.num_batches = int(np.ceil(self.num_samples / batch_size))
        if num_hosts > 1:
            # jitted steps are collective in multi-process runs: every host
            # must run the SAME batch count or the processes deadlock. Each
            # host counts every part (deterministic, metadata-only for
            # parquet) and pads its local stream with zero-mask batches up
            # to the global max (the masked loss/metrics ignore them).
            rows_by_host = {h: 0 for h in range(num_hosts)}
            for i, p in enumerate(parts):
                h = i % num_hosts
                rows_by_host[h] += (self._count_rows(p) if h != host_id
                                    else 0)
            rows_by_host[host_id] = self.num_samples
            self.num_batches = max(
                int(np.ceil(r / batch_size)) for r in rows_by_host.values())

    @staticmethod
    def _count_rows(path):
        if path.endswith(".npz"):
            with np.load(path, allow_pickle=True) as d:
                return len(d[d.files[0]])
        if path.endswith(".tfrecord"):
            from fuxictr_tpu.data.tfrecord import count_records
            return count_records(path)
        import pyarrow.parquet as pq
        return pq.ParquetFile(path).metadata.num_rows

    def _block_iter(self, rng, workers=3, ahead=2):
        """Yield part blocks in order with up to ``workers`` parts decoding
        concurrently (parquet decode releases the GIL) and ``ahead`` decoded
        blocks buffered — keeps the accelerator fed when a single-part
        decode is slower than the device consumes it."""
        parts = list(self.parts)
        if self.shuffle and rng is not None:
            rng.shuffle(parts)
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = collections.deque()
            it = iter(parts)

            def submit(n):
                for p in itertools.islice(it, n):
                    pending.append(
                        pool.submit(load_columns, self.feature_map, p))

            submit(workers + ahead)
            while pending:
                block = pending.popleft().result()
                submit(1)
                yield block

    def _zero_batch(self):
        """An all-padding batch (mask 0 everywhere) matching the stream's
        schema — emitted to keep multi-host batch counts aligned."""
        if getattr(self, "_template", None) is None:
            cols = load_columns(self.feature_map, self._schema_part)
            self._template = {
                k: np.zeros((self.batch_size,) + v.shape[1:], v.dtype)
                for k, v in cols.items()}
        batch = {k: np.zeros_like(v) for k, v in self._template.items()}
        batch[SAMPLE_MASK_KEY] = np.zeros(self.batch_size, np.float32)
        return batch

    def __iter__(self):
        emitted = 0
        for batch in self._local_iter():
            emitted += 1
            if getattr(self, "_template", None) is None:
                self._template = {k: v for k, v in batch.items()
                                  if k != SAMPLE_MASK_KEY}
            yield batch
        # multi-host alignment: pad the local stream to the global count
        for _ in range(self.num_batches - emitted):
            yield self._zero_batch()

    def _local_iter(self):
        if not self.parts:
            return
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            self._epoch += 1
            yield from self._shuffled_iter(rng)
            return
        bs = self.batch_size
        pending = None  # ragged tail rows carried between blocks
        for block in self._block_iter(None):
            if pending is not None:
                block = {k: np.concatenate([pending[k], block[k]])
                         for k in block}
            n = len(next(iter(block.values())))
            full = (n // bs) * bs
            for start in range(0, full, bs):
                batch = {k: v[start:start + bs] for k, v in block.items()}
                batch[SAMPLE_MASK_KEY] = np.ones(bs, dtype=np.float32)
                yield batch
            pending = ({k: v[full:] for k, v in block.items()}
                       if full < n else None)
        if pending is not None:
            batch, mask = _pad_batch(pending, bs)
            batch[SAMPLE_MASK_KEY] = mask
            yield batch

    def _shuffled_iter(self, rng):
        """Cross-block shuffle buffer (reference semantics:
        parquet_block_dataloader.py:91, torchdata shuffle w/ buffer_size
        100k), vectorized at batch granularity: keep a ``buffer_size``-row
        reservoir; every emitted batch is a uniform without-replacement
        sample of the reservoir, whose slots are refilled from the incoming
        part stream. Mixes rows ACROSS part files, unlike a per-block
        shuffle."""
        bs = self.batch_size
        cap = self.buffer_size
        buf = None
        free = None          # indices of reusable slots in buf
        for block in self._block_iter(rng):
            n = len(next(iter(block.values())))
            pos = 0
            if buf is None:  # allocate the reservoir from the first block
                buf = {k: np.empty((cap,) + v.shape[1:], v.dtype)
                       for k, v in block.items()}
                free = np.arange(cap)
            while pos < n:
                if free.size:
                    take = min(free.size, n - pos)
                    slots = free[:take]
                    for k, v in block.items():
                        buf[k][slots] = v[pos:pos + take]
                    free = free[take:]
                    pos += take
                if not free.size:   # reservoir full → emit one batch
                    idx = rng.choice(cap, size=bs, replace=False)
                    batch = {k: v[idx] for k, v in buf.items()}
                    batch[SAMPLE_MASK_KEY] = np.ones(bs, dtype=np.float32)
                    yield batch
                    free = idx
        if buf is None:
            return
        # drain: shuffle the remaining occupied slots
        occupied = np.ones(cap, dtype=bool)
        occupied[free] = False
        order = np.flatnonzero(occupied)
        rng.shuffle(order)
        for start in range(0, order.size, bs):
            idx = order[start:start + bs]
            batch = {k: v[idx] for k, v in buf.items()}
            batch, mask = _pad_batch(batch, bs)
            batch[SAMPLE_MASK_KEY] = mask
            yield batch


class RankDataLoader:
    """Facade selecting the loader by format × streaming, mirroring the
    reference API (rank_dataloader.py:25-101): ``make_iterator()`` returns
    (train, valid) / test / (train, valid, test) depending on ``stage``."""

    def __init__(self, feature_map, stage="both", train_data=None,
                 valid_data=None, test_data=None, batch_size=32, shuffle=True,
                 streaming=False, data_format="npz", **kwargs):
        logging.info("Loading datasets...")
        loader_cls = kwargs.pop("data_loader", None)
        device_cache = kwargs.pop("device_cache", False)
        if loader_cls is None:
            if device_cache:
                from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
                loader_cls = DeviceCacheDataLoader
            else:
                loader_cls = (BlockStreamingDataLoader if streaming
                              else InMemoryDataLoader)
        elif device_cache and hasattr(loader_cls, "_device_cache_cls"):
            # injected loaders can ship a device-resident twin (e.g.
            # LongCTRDataLoader -> LongCTRDeviceCacheLoader)
            loader_cls = loader_cls._device_cache_cls
        train_gen = valid_gen = test_gen = None
        self.stage = stage
        if stage in ("both", "train"):
            train_gen = loader_cls(feature_map, train_data, split="train",
                                   batch_size=batch_size, shuffle=shuffle, **kwargs)
            logging.info("Train samples: total/%d, blocks/%d",
                         train_gen.num_samples, train_gen.num_blocks)
            if valid_data:
                valid_gen = loader_cls(feature_map, valid_data, split="valid",
                                       batch_size=batch_size, shuffle=False, **kwargs)
                logging.info("Validation samples: total/%d, blocks/%d",
                             valid_gen.num_samples, valid_gen.num_blocks)
        if stage in ("both", "test") and test_data:
            test_gen = loader_cls(feature_map, test_data, split="test",
                                  batch_size=batch_size, shuffle=False, **kwargs)
            logging.info("Test samples: total/%d, blocks/%d",
                         test_gen.num_samples, test_gen.num_blocks)
        self.train_gen, self.valid_gen, self.test_gen = train_gen, valid_gen, test_gen

    def make_iterator(self):
        if self.stage == "train":
            return self.train_gen, self.valid_gen
        if self.stage == "test":
            return self.test_gen
        return self.train_gen, self.valid_gen, self.test_gen
