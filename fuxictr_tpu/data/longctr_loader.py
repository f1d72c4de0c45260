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


# ------------------------------------------------------ device-resident
class LongCTRDeviceCacheLoader:
    """Device-resident lifelong-sequence epochs: stage the interaction
    columns, the flat per-user item sequences, AND the item side table in
    HBM once; the user-history join (keep-last-``max_len`` windowing +
    item-feature lookup) happens ON DEVICE inside the jitted step.

    TPU-native rationale (SURVEY §5 long-context disposition:
    "device-resident item side-tables"): the reference joins side tables
    on the host per batch (longctr_dataloader.py:142-187) — at B=1024,
    L=1000 that is ~1M gathered ids per step on the CPU, which bounds
    throughput and loses the device-cache epoch's zero-wire property.
    Here the per-call wire traffic is the same 2 scalars + rng key as the
    flat device cache (data/device_cache.py), and the join is two device
    gathers (window positions into the flat sequence, then item columns).

    Semantics match ``LongCTRDataLoader(dedup_items=False)`` exactly
    (valid prefix = seq[:seq_len], keep-last-L, pre-pad; mask = id > 0).
    Host-side dedup is a HOST optimization and does not apply here; at
    the small/mid vocabs where this loader shines the plain gather is
    already in the cheap regime (BENCHMARKS.md gather cost laws).
    """

    num_blocks = 1
    chunked = False
    host_group = None

    def __init__(self, feature_map, data_path, split="train", batch_size=32,
                 shuffle=False, seed=2019, user_info=None, item_info=None,
                 max_len=50, mesh=None, device_shuffle=True, host_id=0,
                 num_hosts=1, **kwargs):
        import jax

        if not str(data_path).endswith(".parquet"):
            data_path = str(data_path) + ".parquet"
        self.feature_map = feature_map
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.device_shuffle = device_shuffle
        self.mesh = mesh
        self.max_len = int(max_len)
        self._epoch = 0

        df = pd.read_parquet(data_path)
        n = len(df)
        self.num_samples = n
        self._multihost = num_hosts > 1 and mesh is not None
        self._num_hosts = num_hosts
        if self._multihost:
            # multi-host mesh (VERDICT r4 #4, LongCTR flavor): the
            # INTERACTION blocks shard row-wise over 'data' (each process
            # stages only its contiguous slice), while the user-sequence
            # and item SIDE tables — read in full by every process from
            # the shared parquet files — stay replicated. The device join
            # then runs as one GSPMD program.
            n_data = mesh.shape["data"]
            if n_data % num_hosts != 0:
                raise ValueError(
                    f"LongCTR device cache over a multi-host mesh needs "
                    f"the 'data' axis ({n_data}) divisible by the process "
                    f"count ({num_hosts})")
            spd = n_data // num_hosts
            per = int(np.ceil(n / num_hosts))
            per = int(np.ceil(per / spd)) * spd
            self._per_host_rows = per
            self._host_valid = np.clip(
                n - per * np.arange(num_hosts), 0, per).astype(np.int32)
            self._n_rows = per * num_hosts
            lo_row = host_id * per
            local_rows = per
        else:
            self.num_batches = int(np.ceil(n / batch_size))
            self._n_rows = self.num_batches * batch_size
            lo_row = 0
            local_rows = self._n_rows
        self.num_batches = int(np.ceil(self._n_rows / batch_size))
        self._n_valid = n
        self._chunk_bounds = [(0, self._n_rows)]

        # ---- int block: user_index, item_index, seq_len, user features
        user_feats = [f for f, spec in feature_map.features.items()
                      if spec.get("source") != "item" and f in df.columns]
        self._int_cols = ["user_index", "item_index", "seq_len"] + user_feats
        self._user_feats = user_feats
        sl = slice(lo_row, lo_row + local_rows)
        n_local = max(min(n - lo_row, local_rows), 0)
        block_int = np.zeros((local_rows, len(self._int_cols)), np.int32)
        for j, c in enumerate(self._int_cols):
            block_int[:n_local, j] = \
                df[c].to_numpy()[sl].astype(np.int32)
        # ---- float block: labels
        labels = list(feature_map.labels)
        self._labels = labels
        block_float = np.zeros((local_rows, len(labels)), np.float32)
        for j, c in enumerate(labels):
            block_float[:n_local, j] = \
                df[c].to_numpy()[sl].astype(np.float32)
        self.host_labels = block_float.copy()

        gid = getattr(feature_map, "group_id", None)
        if gid in self._int_cols:
            self.host_group = block_int[:, self._int_cols.index(gid)].copy()

        # ---- flat user sequences + offsets
        user_df = pd.read_parquet(user_info)
        seqs = [np.asarray(s, dtype=np.int32)
                for s in user_df["full_item_seq"]]
        off = np.zeros(len(seqs) + 1, np.int64)
        np.cumsum([len(s) for s in seqs], out=off[1:])
        flat = (np.concatenate(seqs) if seqs
                else np.zeros(0, np.int32)).astype(np.int32)

        # ---- item side table (dense by item_index via lut if needed)
        item_df = pd.read_parquet(item_info).set_index("item_index")
        idx_map = item_df.index.to_numpy()
        item_cols = {c: np.asarray(item_df[c].to_numpy())
                     for c in item_df.columns
                     if c in feature_map.features}
        self._item_col_names = list(item_cols)
        lut = None
        if not np.array_equal(idx_map, np.arange(len(idx_map))):
            lut = np.zeros(int(idx_map.max()) + 1, np.int32)
            lut[idx_map] = np.arange(len(idx_map), dtype=np.int32)

        placement = None
        blk_placement = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            placement = NamedSharding(mesh, P())
            blk_placement = (NamedSharding(mesh, P("data"))
                             if self._multihost else placement)

        def put(x):
            """Side tables: identical full copies on every process."""
            if self._multihost:
                return jax.make_array_from_process_local_data(placement, x)
            return (jax.device_put(x, placement) if placement is not None
                    else jax.device_put(x))

        def put_block(x):
            """Interaction blocks: this process's row slice of the
            'data'-sharded global array (replicated single-host)."""
            if self._multihost:
                return jax.make_array_from_process_local_data(
                    blk_placement, x)
            return (jax.device_put(x, blk_placement)
                    if blk_placement is not None else jax.device_put(x))

        from fuxictr_tpu.data.device_cache import (CACHE_FLOAT_KEY,
                                                   CACHE_INT_KEY)

        def put_widened(x):
            """Narrow-wire staging for the flat event array (the dominant
            transfer at lifelong lengths): ship u16 when every id fits,
            widen back to int32 on device — resident layout unchanged
            (same scheme as device_cache._put_int_block). Replicated:
            every process computes the identical plan from the same full
            array, so multi-host stays consistent."""
            import jax.numpy as jnp
            if (kwargs.get("narrow_staging", True) and x.size
                    and int(x.min()) >= 0
                    and int(x.max()) <= np.iinfo(np.uint16).max):
                widen = jax.jit(lambda a: a.astype(jnp.int32),
                                out_shardings=placement)
                return widen(put(np.ascontiguousarray(
                    x.astype(np.uint16))))
            return put(x)

        self._refs = {CACHE_INT_KEY: put_block(block_int),
                      CACHE_FLOAT_KEY: put_block(block_float),
                      "__cache_useq__": put_widened(flat),
                      "__cache_uoff__": put(off.astype(np.int32))}
        if lut is not None:
            self._refs["__cache_ilut__"] = put(lut)
        for c, arr in item_cols.items():
            self._refs[f"__cache_item_{c}__"] = put(arr.astype(np.int32))
        jax.block_until_ready(self._refs)
        logging.info(
            "LongCTR device cache: %d rows + %d seq events + %d-item side "
            "table staged (max_len=%d)", n, len(flat),
            len(idx_map), self.max_len)

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        """Per-batch fallback (steps_per_call=1): index batches over the
        resident refs, same contract as DeviceCacheDataLoader.__iter__."""
        if self._multihost:
            raise ValueError(
                "multi-host LongCTR device cache has no host-side batch "
                "iterator (labels/rows are process-local slices); "
                "fit/evaluate drive it through the device epoch and "
                "device metric paths")
        from fuxictr_tpu.data.device_cache import (GROUP_KEY, LABELS_KEY,
                                                   ROWS_KEY)
        order = np.arange(self._n_rows, dtype=np.int32)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        B = self.batch_size
        for start in range(0, self._n_rows, B):
            idx = order[start:start + B]
            mask = (idx < self._n_valid).astype(np.float32)
            idx = np.where(mask > 0, idx, -1).astype(np.int32)
            batch = dict(self._refs)
            batch[ROWS_KEY] = idx
            batch[SAMPLE_MASK_KEY] = mask
            # host-side label/group rides along for evaluate()'s per-batch
            # path — same contract as DeviceCacheDataLoader.__iter__
            batch[LABELS_KEY] = self.host_labels[np.maximum(idx, 0)]
            if self.host_group is not None:
                batch[GROUP_KEY] = self.host_group[np.maximum(idx, 0)]
            yield batch

    # --- device-cache protocol (reuses DeviceCacheDataLoader's drivers)
    def eval_slots(self, feature_map):
        """This loader's packed layout differs from the canonical
        cache_layout (float block = labels only; int block =
        user_index/item_index/seq_len/user-features), so the on-device
        eval kernel must take ITS column slots (a cache_layout-derived
        slot would silently read the wrong column —
        models/base.py:_cache_eval_slots)."""
        lab_lo = self._labels.index(feature_map.labels[0])
        gid = getattr(feature_map, "group_id", None)
        g_lo = (self._int_cols.index(gid)
                if gid is not None and gid in self._int_cols else None)
        return lab_lo, g_lo

    def cache_refs(self):
        return dict(self._refs)

    _stage_chunk = lambda self, lo, hi: self.cache_refs()

    def _row_validity(self, order):
        from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
        return DeviceCacheDataLoader._row_validity(self, order)

    def _chunk_order(self, lo, hi, epoch, chunk_id, shuffle):
        from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
        return DeviceCacheDataLoader._chunk_order(
            self, lo, hi, epoch, chunk_id, shuffle)

    def epoch_chunks(self):
        from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
        return DeviceCacheDataLoader.epoch_chunks(self)

    def eval_chunks(self):
        from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
        return DeviceCacheDataLoader.eval_chunks(self)

    def epoch_order(self):
        from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
        return DeviceCacheDataLoader.epoch_order(self)

    @property
    def cache_expander(self):
        """In-jit: row indices -> full LongCTR batch (device join)."""
        import jax.numpy as jnp

        from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
        from fuxictr_tpu.data.device_cache import (CACHE_FLOAT_KEY,
                                                   CACHE_INT_KEY, ROWS_KEY)
        L = self.max_len
        int_cols = list(self._int_cols)
        labels = list(self._labels)
        item_names = list(self._item_col_names)
        u_slot = int_cols.index("user_index")
        t_slot = int_cols.index("item_index")
        s_slot = int_cols.index("seq_len")

        def expand(batch):
            if ROWS_KEY not in batch or "__cache_useq__" not in batch:
                return batch
            idx = jnp.maximum(batch[ROWS_KEY], 0)
            ints = batch[CACHE_INT_KEY][idx]                  # [B, k]
            out = {c: ints[:, j] for j, c in enumerate(int_cols)
                   if c not in ("user_index", "item_index", "seq_len")}
            floats = batch[CACHE_FLOAT_KEY][idx]
            for j, lb in enumerate(labels):
                out[lb] = floats[:, j]
            u = ints[:, u_slot]
            tgt = ints[:, t_slot]
            off = batch["__cache_uoff__"]
            start = off[u]
            # valid prefix = seq[:seq_len] (clamped to the stored length);
            # window = the LAST L of that prefix, pre-padded
            slen = jnp.minimum(ints[:, s_slot], off[u + 1] - start)
            pos = (start + slen)[:, None] - L + jnp.arange(L)[None]
            valid = pos >= start[:, None]
            seqs = jnp.where(
                valid, batch["__cache_useq__"][jnp.maximum(pos, 0)], 0)
            out[SEQ_MASK_KEY] = (seqs > 0).astype(jnp.float32)
            flat = jnp.concatenate([seqs, tgt[:, None]], axis=1).reshape(-1)
            rows = (batch["__cache_ilut__"][flat]
                    if "__cache_ilut__" in batch else flat)
            out[ITEMS_KEY] = {c: batch[f"__cache_item_{c}__"][rows]
                              for c in item_names}
            out[SAMPLE_MASK_KEY] = batch[SAMPLE_MASK_KEY]
            return out

        return expand


LongCTRDataLoader._device_cache_cls = LongCTRDeviceCacheLoader
