"""LongCTR side-table input stack.

Parity with /root/reference/model_zoo/LongCTR/longctr_dataloader.py:26-187:
the training file stores only ``(user_index, item_index, seq_len, ...)``;
per-user full item sequences live in ``user_info.parquet`` and per-item
features in ``item_info.parquet``, joined at collate time.

TPU-native differences: batches always pad/truncate to a FIXED ``max_len``
(keep-last / pre-pad, the reference default) so every batch has the same
shape under jit, and the joined item features are emitted as a nested
``"__items__"`` dict of ``[B*(max_len+1)]`` arrays (sequence + target).
"""

import logging

import numpy as np
import pandas as pd

from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
from fuxictr_tpu.ops.embedding import INVERSE_KEY  # noqa: F401 (re-export)

ITEMS_KEY = "__items__"
SEQ_MASK_KEY = "__seq_mask__"


class LongCTRDataLoader:
    """``dedup_items=True`` (default) deduplicates the per-batch item ids on
    the host (np.unique, overlapped with device compute by the prefetcher)
    and emits unique-row item features plus an ``__item_inverse__`` index.
    Measured on TPU v5e: a gather's *per-row* cost grows with the table
    size (2M-row gather: 5.9ms from a 10k-row table vs 49.4ms from 2.6M
    rows — BENCHMARKS.md), independent of row duplication, so the win comes
    from shrinking the ROW COUNT gathered from the big table: embed the ~U
    unique items, then expand through the small temp via the inverse. The
    unique array is padded with id 0 to the next power-of-two bucket
    (>= ``dedup_min_bucket``), so jit sees a bounded set of shapes — one
    retrace per bucket, amortised over the epoch."""

    def __init__(self, feature_map, data_path, split="train", batch_size=32,
                 shuffle=False, user_info=None, item_info=None, max_len=50,
                 dedup_items=True, dedup_min_bucket=4096, **kwargs):
        self.dedup_items = dedup_items
        self.dedup_min_bucket = dedup_min_bucket
        if not str(data_path).endswith(".parquet"):
            data_path = str(data_path) + ".parquet"
        self.feature_map = feature_map
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_len = max_len
        df = pd.read_parquet(data_path)
        self.columns = {}
        all_cols = set(list(feature_map.features.keys()) + feature_map.labels
                       + ["user_index", "item_index", "seq_len"])
        for col in df.columns:
            if col in all_cols:
                self.columns[col] = np.asarray(df[col].to_numpy())
        self.num_samples = len(df)
        self.num_blocks = 1
        self.num_batches = int(np.ceil(self.num_samples / batch_size))
        user_df = pd.read_parquet(user_info)
        self.user_seqs = user_df["full_item_seq"].to_numpy()
        item_df = pd.read_parquet(item_info).set_index("item_index")
        self.item_cols = {
            col: np.asarray(np.stack(item_df[col].to_list())
                            if item_df[col].dtype == object
                            else item_df[col].to_numpy())
            for col in item_df.columns if col in all_cols}
        self.item_index_map = item_df.index.to_numpy()
        # item_info rows are assumed indexed 0..N-1 by item_index; build a
        # dense lookup otherwise
        if not np.array_equal(self.item_index_map,
                              np.arange(len(self.item_index_map))):
            lut = np.zeros(int(self.item_index_map.max()) + 1, np.int64)
            lut[self.item_index_map] = np.arange(len(self.item_index_map))
            self._lut = lut
        else:
            self._lut = None
        logging.info("LongCTR loader: %d samples, max_len=%d",
                     self.num_samples, max_len)

    def __len__(self):
        return self.num_batches

    def _gather_items(self, flat_ids):
        rows = self._lut[flat_ids] if self._lut is not None else flat_ids
        return {col: arr[rows] for col, arr in self.item_cols.items()}

    def __iter__(self):
        order = np.arange(self.num_samples)
        if self.shuffle:
            np.random.shuffle(order)
        L = self.max_len
        for start in range(0, self.num_samples, self.batch_size):
            idx = order[start:start + self.batch_size]
            n = len(idx)
            batch = {col: arr[idx] for col, arr in self.columns.items()}
            seq_lens = batch["seq_len"].astype(np.int64)
            # native collate: keep-last-L + pre-pad in C (numpy fallback)
            from fuxictr_tpu.native import pad_sequences
            seqs = pad_sequences(
                [self.user_seqs[u] for u in batch["user_index"]],
                seq_lens, L, pre_pad=True)
            mask = (seqs > 0).astype(np.float32)
            flat = np.hstack([seqs, batch["item_index"].reshape(-1, 1)])
            batch[SEQ_MASK_KEY] = mask
            # fixed-shape batches: pad the last partial batch
            if n < self.batch_size:
                pad = self.batch_size - n
                batch = _pad_tree(batch, pad)
                flat = np.concatenate(
                    [flat, np.zeros((pad, L + 1), flat.dtype)])
                sample_mask = np.concatenate(
                    [np.ones(n, np.float32), np.zeros(pad, np.float32)])
            else:
                sample_mask = np.ones(n, np.float32)
            flat = flat.reshape(-1)
            if self.dedup_items:
                from fuxictr_tpu.native import unique_inverse
                uniq, inv = unique_inverse(flat)   # linear-pass hash dedup
                cap = self.dedup_min_bucket
                while cap < uniq.shape[0]:
                    cap *= 2
                ids = np.zeros(min(cap, flat.shape[0]), flat.dtype)
                ids[:uniq.shape[0]] = uniq
                batch[ITEMS_KEY] = self._gather_items(ids)
                # inside the items dict: FeatureEmbedding.embedding_dict
                # expands every field through it (fused single-scatter VJP)
                batch[ITEMS_KEY][INVERSE_KEY] = inv.astype(np.int32)
            else:
                batch[ITEMS_KEY] = self._gather_items(flat)
            batch[SAMPLE_MASK_KEY] = sample_mask
            yield batch


def _pad_tree(batch, pad):
    return {k: np.concatenate([v, np.zeros((pad,) + v.shape[1:], v.dtype)])
            for k, v in batch.items()}
