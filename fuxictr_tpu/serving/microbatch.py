"""Micro-batching request queue for the serving path.

TPU-native rationale: the chip executes one program at a time and its
throughput comes from the batch dimension, so concurrent single-row
requests must be COALESCED, not parallelized. The MicroBatcher owns the
only thread that touches the Predictor: request threads enqueue their
columns and block; the dispatcher drains the queue, concatenates
compatible requests up to the largest AOT bucket (with a bounded linger
so a lone request is never stalled), runs ONE bucketed prediction, and
scatters the slices back. Tail latency under load collapses from
"queue-of-programs" to "shared program + slice".

No reference equivalent (the reference stops at training). Used by
serving/server.py via ``--microbatch``.
"""

import collections
import threading
import time

import numpy as np


def _signature(cols):
    """Requests are batchable iff they agree on columns and row shapes."""
    return tuple(sorted((k, np.asarray(v).shape[1:], np.asarray(v).dtype.kind)
                        for k, v in cols.items()))


class _Pending:
    __slots__ = ("cols", "n", "sig", "event", "result", "error")

    def __init__(self, cols, n, sig):
        self.cols = cols
        self.n = n
        self.sig = sig
        self.event = threading.Event()
        self.result = None
        self.error = None


class MicroBatcher:
    """Coalesce concurrent predict() calls into shared bucketed batches.

    Args:
        predictor: a :class:`fuxictr_tpu.serving.Predictor`.
        max_batch: coalescing cap (default: the largest AOT bucket).
        linger_ms: how long the dispatcher waits for more requests after
            picking up the first of a batch. Latency floor for a lone
            request; keep it at ~1-2 ms (well under a forward pass).
    """

    def __init__(self, predictor, max_batch=None, linger_ms=2.0):
        self.predictor = predictor
        self.max_batch = int(max_batch or max(predictor.batch_buckets))
        self.linger = float(linger_ms) / 1e3
        self._queue = collections.deque()
        self._cv = threading.Condition()
        self._closed = False
        self.batches_run = 0
        self.rows_run = 0
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="microbatch-dispatch")
        self._thread.start()

    # ------------------------------------------------------------ client
    def predict(self, cols):
        """Blocking predict; safe from any number of request threads."""
        cols = {k: np.asarray(v) for k, v in cols.items()}
        n = int(next(iter(cols.values())).shape[0])
        item = _Pending(cols, n, _signature(cols))
        with self._cv:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            self._queue.append(item)
            self._cv.notify()
        item.event.wait()
        if item.error is not None:
            raise item.error
        return item.result

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    # -------------------------------------------------------- dispatcher
    def _take_batch(self):
        """Collect a compatible run of requests (bounded size + linger)."""
        with self._cv:
            while not self._queue and not self._closed:
                self._cv.wait()
            if not self._queue:
                return None
            batch = [self._queue.popleft()]
        total = batch[0].n
        deadline = time.perf_counter() + self.linger
        while total < self.max_batch:
            with self._cv:
                if self._queue:
                    if (self._queue[0].sig != batch[0].sig
                            or total + self._queue[0].n > self.max_batch):
                        break    # incompatible or over-bucket: next round
                    nxt = self._queue.popleft()
                    batch.append(nxt)
                    total += nxt.n
                    continue
                remaining = deadline - time.perf_counter()
                if remaining <= 0 or self._closed:
                    break
                self._cv.wait(timeout=remaining)
        return batch

    def _loop(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            try:
                if len(batch) == 1:
                    y = self.predictor.predict(batch[0].cols)
                    batch[0].result = np.asarray(y)
                else:
                    keys = batch[0].cols.keys()
                    merged = {k: np.concatenate([b.cols[k] for b in batch])
                              for k in keys}
                    y = np.asarray(self.predictor.predict(merged))
                    off = 0
                    for b in batch:
                        b.result = y[off:off + b.n]
                        off += b.n
                self.batches_run += 1
                self.rows_run += sum(b.n for b in batch)
            except Exception as exc:        # noqa: BLE001 — per-batch fault
                for b in batch:
                    b.error = exc
            finally:
                for b in batch:
                    b.event.set()
