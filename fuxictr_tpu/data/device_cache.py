"""Device-resident dataset cache: stage a whole split into HBM once, then
feed the jitted step only a tiny per-batch row-index array.

TPU-native rationale (no reference equivalent — the reference's loaders,
e.g. /root/reference/fuxictr/pytorch/dataloaders/parquet_dataloader.py,
re-send every batch from host memory): on a remote-TPU / tunneled backend
the per-step host->device copy of a full batch (~1.3MB for Criteo at
B=8192) dominates the 16.75ms compiled step. Caching the epoch in HBM cuts
the per-step wire cost to a [B] int32 row-index + [B] f32 mask (~64KB),
and the on-device row gather is cheap because rows are packed CONTIGUOUSLY:
one ``[N, n_int_cols]`` int32 block and one ``[N, n_float_cols]`` f32
block, so each sampled row is a single wide DMA instead of one tiny gather
per feature column (gather cost is per-row latency-bound; see
BENCHMARKS.md gather/scatter cost laws).

Batches from this loader look like::

    {"__rows__":        [B] int32   (-1 marks padding),
     "__cache_int__":   [N, Wi] int32   (device-resident, passed by ref),
     "__cache_float__": [N, Wf] float32 (device-resident, passed by ref),
     "__mask__":        [B] float32}

``expand_cached_batch`` (called inside the jitted train/predict steps)
row-gathers the two blocks and re-slices them into the standard
``{feature_name: array}`` batch the model networks consume, so every model
in the zoo works unchanged on top of the cache.
"""

import logging
from functools import partial

import numpy as np

from fuxictr_tpu.data.array_dataset import (SAMPLE_MASK_KEY, expand_path,
                                            load_columns)

ROWS_KEY = "__rows__"
CACHE_INT_KEY = "__cache_int__"
CACHE_FLOAT_KEY = "__cache_float__"
LABELS_KEY = "__labels__"      # host-side, for evaluate() only
GROUP_KEY = "__group__"        # host-side group_id, for grouped metrics


_ORDER_JIT = None


def _device_order(key, n, n_valid, padded, shuffle):
    """Row order for ``n`` local rows built ON DEVICE: permutation (or
    arange), invalid rows (>= n_valid) and tail padding marked -1. One
    module-level jit with static shape args so epochs and chunks reuse the
    compiled executable instead of re-tracing a fresh closure per epoch."""
    global _ORDER_JIT
    if _ORDER_JIT is None:
        import jax
        import jax.numpy as jnp

        def impl(key, n, n_valid, padded, shuffle):
            perm = (jax.random.permutation(key, n) if shuffle
                    else jnp.arange(n))
            perm = jnp.where(perm < n_valid, perm, -1).astype(jnp.int32)
            return jnp.concatenate(
                [perm, jnp.full((padded - n,), -1, jnp.int32)])

        _ORDER_JIT = jax.jit(impl, static_argnums=(1, 2, 3, 4))
    return _ORDER_JIT(key, n, n_valid, padded, shuffle)


def cache_layout(feature_map):
    """Static column layout: name -> (block, offset, width, kind).

    block is "int" or "float"; width is 1 (scalar), max_len (sequence) or
    pretrain_dim (embedding). Raises for features a packed numeric block
    cannot represent (string metas).
    """
    layout = {}
    wi = wf = 0
    for name, spec in feature_map.features.items():
        t = spec["type"]
        if t in ("categorical",):
            layout[name] = ("int", wi, 1, t)
            wi += 1
        elif t == "sequence":
            w = int(spec["max_len"])
            layout[name] = ("int", wi, w, t)
            wi += w
        elif t == "numeric":
            layout[name] = ("float", wf, 1, t)
            wf += 1
        elif t == "embedding":
            w = int(spec["pretrain_dim"])
            layout[name] = ("float", wf, w, t)
            wf += w
        elif t == "meta":
            # group_id-style integer metas ride in the int block
            layout[name] = ("int", wi, 1, t)
            wi += 1
        else:
            raise ValueError(
                f"device cache cannot pack feature type {t!r} ({name})")
    for label in feature_map.labels:
        layout[label] = ("float", wf, 1, "label")
        wf += 1
    return layout, wi, wf


def expand_cached_batch(feature_map, batch):
    """Inside-jit: turn a row-index batch into a standard feature batch by
    gathering packed rows from the device cache. No-op for ordinary
    batches."""
    if ROWS_KEY not in batch:
        return batch
    import jax.numpy as jnp
    layout, _, _ = cache_layout(feature_map)
    idx = jnp.maximum(batch[ROWS_KEY], 0)
    rows = {}
    if CACHE_INT_KEY in batch:
        rows["int"] = batch[CACHE_INT_KEY][idx]
    if CACHE_FLOAT_KEY in batch:
        rows["float"] = batch[CACHE_FLOAT_KEY][idx]
    out = {}
    for name, (block, lo, w, kind) in layout.items():
        col = rows[block][:, lo:lo + w]
        if w == 1 and kind not in ("sequence", "embedding"):
            col = col[:, 0]
        out[name] = col
    out[SAMPLE_MASK_KEY] = batch[SAMPLE_MASK_KEY]
    return out


class DeviceCacheDataLoader:
    """Loads every part file, packs columns into two row-major blocks, and
    stages them on the accelerator once. Iteration yields index batches
    (see module docstring). Multi-host: each process stages only its
    contiguous ``1/num_hosts`` row slice (same contract as
    InMemoryDataLoader).

    ``mesh``: optional jax.sharding.Mesh — the cache blocks are placed
    replicated on the mesh so sharded train steps can consume them.
    """

    num_samples = 0
    num_blocks = 1
    num_batches = 0

    def __init__(self, feature_map, data_path, split="train", batch_size=32,
                 shuffle=False, seed=2019, host_id=0, num_hosts=1,
                 mesh=None, device_shuffle=True, hbm_limit_gb=None,
                 **kwargs):
        import jax

        self.feature_map = feature_map
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.device_shuffle = device_shuffle
        self.mesh = mesh
        self._epoch = 0
        layout, wi, wf = cache_layout(feature_map)
        self._layout = layout
        parts = expand_path(data_path)
        if not parts:
            raise ValueError(f"no data parts found at {data_path}")
        # count first so the blocks can be preallocated and filled part by
        # part (peak host RAM = one part + the packed blocks)
        import pyarrow.parquet as pq
        counts = []
        for p in parts:
            if p.endswith(".npz"):
                with np.load(p, allow_pickle=True) as d:
                    counts.append(len(d[d.files[0]]))
            elif p.endswith(".tfrecord"):
                from fuxictr_tpu.data.tfrecord import count_records
                counts.append(count_records(p))
            else:
                counts.append(pq.ParquetFile(p).metadata.num_rows)
        total = int(sum(counts))
        self.num_samples = total
        self.num_blocks = len(parts)

        lo_row = 0
        hi_row = total
        self._multihost = num_hosts > 1 and mesh is not None
        self._num_hosts = num_hosts
        if self._multihost:
            # multi-host mesh cache (VERDICT r4 #4): each process stages
            # ONLY its contiguous row slice; the global blocks are
            # assembled as 'data'-row-sharded jax.Arrays via
            # make_array_from_process_local_data (no replication — the
            # aggregate resident set scales with hosts). The epoch
            # permutation is computed identically on every process (shared
            # seed) over GLOBAL row ids; the jitted epoch scan then runs
            # as one GSPMD program whose row gathers XLA lowers to
            # collectives over the sharded blocks.
            n_data = mesh.shape["data"]
            if n_data % num_hosts != 0:
                raise ValueError(
                    f"device cache over a multi-host mesh needs the 'data' "
                    f"axis ({n_data}) divisible by the process count "
                    f"({num_hosts})")
            spd = n_data // num_hosts   # data-shards this host owns
            per = int(np.ceil(total / num_hosts))
            per = int(np.ceil(per / spd)) * spd   # whole per-device shards
            lo_row = host_id * per
            hi_row = min(lo_row + per, total)
            self._per_host_rows = per
            self._n_rows = per * num_hosts        # GLOBAL program rows
            # per-host valid counts are derivable on every process — the
            # order/validity masks must agree everywhere
            self._host_valid = np.clip(
                total - per * np.arange(num_hosts), 0, per).astype(np.int32)
        elif num_hosts > 1:
            per = int(np.ceil(total / num_hosts))
            lo_row = host_id * per
            hi_row = min(lo_row + per, total)
            self._n_rows = per          # padded: same batch count per host
        else:
            self._n_rows = total
        n_local = max(hi_row - lo_row, 0)
        self._n_valid = n_local
        # multi-host mesh: the host arrays hold only THIS process's slice
        local_rows = (self._per_host_rows if self._multihost
                      else self._n_rows)
        block_int = np.zeros((local_rows, wi), np.int32)
        block_float = np.zeros((local_rows, wf), np.float32)

        row = 0
        for p, cnt in zip(parts, counts):
            p_lo, p_hi = row, row + cnt
            row = p_hi
            s = max(p_lo, lo_row)
            e = min(p_hi, hi_row)
            if s >= e:
                continue
            cols = load_columns(feature_map, p)
            sl = slice(s - p_lo, e - p_lo)
            dst = slice(s - lo_row, e - lo_row)
            for name, (block, lo, w, kind) in layout.items():
                v = cols[name][sl]
                if kind == "meta":
                    if not np.issubdtype(np.asarray(v).dtype, np.number):
                        raise ValueError(
                            f"device cache cannot pack non-numeric meta "
                            f"column {name!r} (dtype {np.asarray(v).dtype})")
                    if np.asarray(v).size and (
                            np.max(v) > np.iinfo(np.int32).max
                            or np.min(v) < np.iinfo(np.int32).min):
                        raise ValueError(
                            f"meta column {name!r} exceeds int32 range; "
                            f"re-encode it (e.g. factorize group ids) "
                            f"before using the device cache")
                target = block_int if block == "int" else block_float
                target[dst, lo:lo + w] = v.reshape(v.shape[0], w)
        # host-side copies of what evaluate() reads WITHOUT the device:
        # labels (+ group_id) — tiny next to the feature blocks
        lab_cols = [layout[lb][1] for lb in feature_map.labels]
        self.host_labels = block_float[:, lab_cols].copy()
        self.host_group = None
        gid = getattr(feature_map, "group_id", None)
        if gid is not None and gid in layout:
            self.host_group = block_int[:, layout[gid][1]].copy()
        # chunking: if the packed split exceeds the HBM budget, keep the
        # host blocks and rotate batch-aligned row super-chunks through
        # HBM per epoch (double-buffered staging; see epoch_chunks)
        bytes_per_row = (block_int.dtype.itemsize * max(wi, 0)
                         + block_float.dtype.itemsize * max(wf, 0))
        # narrow staging derives per-column dtypes from LOCAL min/max;
        # across processes the plans could disagree and corrupt the
        # assembled global block — ship canonical int32 on multi-host
        # (the stage is host-local RAM -> local devices there anyway)
        self._narrow = (self._plan_narrow(block_int)
                        if kwargs.get("narrow_staging", True)
                        and not self._multihost else None)
        # OPT-IN lossy wire compression for the float block (numerics +
        # labels): ship as f16/bf16, cast back to f32 on device. Halves
        # the float wire bytes at ~1e-3 relative error on normalized
        # numerics (labels 0/1 are exact in both). Default off — the
        # default path stays bit-exact.
        fs = kwargs.get("float_staging")
        if fs in (None, "", "float32", "fp32"):
            self._float_staging = None
        elif fs in ("bfloat16", "bf16"):
            import ml_dtypes
            self._float_staging = np.dtype(ml_dtypes.bfloat16)
        else:
            self._float_staging = np.dtype(fs)     # e.g. float16
        self._repack_jit = {}
        self._chunk_bounds = [(0, self._n_rows)]
        if hbm_limit_gb:
            rpc = int(float(hbm_limit_gb) * 2 ** 30 // max(bytes_per_row, 1))
            rpc = max(rpc // batch_size * batch_size, batch_size)
            if rpc < self._n_rows:
                # epoch_chunks double-buffers (chunk i+1 stages while
                # chunk i trains): two chunks are resident at peak, so
                # each chunk gets HALF the budget — a THIRD of it when
                # narrow staging is active, whose repack transiently holds
                # narrow parts + the int32 output alongside the chunk
                divisor = 3 if self._narrow is not None else 2
                rpc = max(rpc // divisor // batch_size * batch_size,
                          batch_size)
                if mesh is not None:
                    raise ValueError(
                        "hbm_limit_gb chunking is single-device only "
                        "(mesh caches must be resident)")
                self._chunk_bounds = [
                    (lo, min(lo + rpc, self._n_rows))
                    for lo in range(0, self._n_rows, rpc)]
        self.chunked = len(self._chunk_bounds) > 1

        if self.chunked:
            self._host_int, self._host_float = block_int, block_float
            self._dev_int = self._dev_float = None
            logging.info(
                "Device cache (chunked): %d rows in %d HBM chunks of "
                "%.2f GB (%.2f GB total packed)", self._n_valid,
                len(self._chunk_bounds),
                self._chunk_bounds[0][1] * bytes_per_row / 2 ** 30,
                (block_int.nbytes + block_float.nbytes) / 2 ** 30)
        else:
            logging.info(
                "Device cache: %d rows staged (%.2f GB int + %.2f GB float)",
                self._n_valid, block_int.nbytes / 2 ** 30,
                block_float.nbytes / 2 ** 30)
            placement = None
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                # single-host mesh: blocks replicated (every device sees
                # all rows); multi-host: row-sharded over 'data' — each
                # process contributes only its local slice and the
                # aggregate resident set scales with hosts
                placement = NamedSharding(
                    mesh, P("data") if self._multihost else P())
            self._dev_int = self._put_int_block(block_int, placement)
            self._dev_float = self._put_float_block(block_float, placement)
            jax.block_until_ready((self._dev_int, self._dev_float))
        self.num_batches = sum(
            int(np.ceil((hi - lo) / batch_size))
            for lo, hi in self._chunk_bounds)

    # -------------------------------------------------- narrow-wire staging
    # Host->device transfer of the int block is the e2e bottleneck once
    # compiles are cached (BENCHMARKS.md "e2e decomposition"): most CTR
    # categorical columns have vocabs far below 2^16, so shipping them as
    # int32 wastes 2-4x wire bytes. Columns are staged in the narrowest
    # unsigned dtype their values fit ({u8, u16, i32} groups) and repacked
    # into the canonical int32 block by ONE jitted donate-input program on
    # the device — the resident layout (and every downstream program) is
    # byte-identical to direct staging; only the wire transfer shrinks.
    def _plan_narrow(self, block_int):
        if block_int.shape[1] == 0 or block_int.shape[0] == 0:
            return None
        lo = block_int.min(axis=0)
        hi = block_int.max(axis=0)
        groups = {"u8": [], "u16": [], "i32": []}
        for c in range(block_int.shape[1]):
            if lo[c] >= 0 and hi[c] <= np.iinfo(np.uint8).max:
                groups["u8"].append(c)
            elif lo[c] >= 0 and hi[c] <= np.iinfo(np.uint16).max:
                groups["u16"].append(c)
            else:
                groups["i32"].append(c)
        if not groups["u8"] and not groups["u16"]:
            return None
        perm = groups["u8"] + groups["u16"] + groups["i32"]
        return {"groups": groups,
                "inv": np.argsort(np.asarray(perm)).astype(np.int32)}

    def _put_int_block(self, block_int, placement):
        """Stage an int32 block (or a row slice of one) through the narrow
        wire path; returns the device-resident canonical int32 block."""
        import jax
        import jax.numpy as jnp

        def put(x):
            if getattr(self, "_multihost", False) and placement is not None:
                # x is this process's local row slice of the global block
                return jax.make_array_from_process_local_data(placement, x)
            return (jax.device_put(x, placement) if placement is not None
                    else jax.device_put(x))

        plan = self._narrow
        if plan is None:
            return put(block_int)
        g = plan["groups"]
        inv = plan["inv"]
        parts = []
        for dtype, cols in (("uint8", g["u8"]), ("uint16", g["u16"]),
                            ("int32", g["i32"])):
            if cols:
                parts.append(put(np.ascontiguousarray(
                    block_int[:, cols].astype(np.dtype(dtype)))))

        # one jitted repack per placement, cached: the chunked staging
        # path calls this per chunk per epoch, and a fresh closure each
        # call would defeat jax.jit's function-identity cache (re-trace,
        # and re-compile without a persistent cache, on the hot path).
        # No donation: XLA can't reuse a uint8/16 buffer for the int32
        # output anyway; the narrow blocks free on return instead.
        if not hasattr(self, "_repack_jit"):
            self._repack_jit = {}
        repack = self._repack_jit.get(("int", placement))
        if repack is None:
            @partial(jax.jit, out_shardings=placement)
            def repack(*narrow):
                full = jnp.concatenate(
                    [p.astype(jnp.int32) for p in narrow], axis=1)
                return jnp.take(full, jnp.asarray(inv), axis=1)

            self._repack_jit[("int", placement)] = repack
        return repack(*parts)

    def _put_float_block(self, block_float, placement):
        """Stage the float block; with ``float_staging`` set, ship f16/bf16
        on the wire and widen back to f32 on device (opt-in, lossy)."""
        import jax
        import jax.numpy as jnp

        def put(x):
            if getattr(self, "_multihost", False) and placement is not None:
                return jax.make_array_from_process_local_data(placement, x)
            return (jax.device_put(x, placement) if placement is not None
                    else jax.device_put(x))

        dt = getattr(self, "_float_staging", None)
        if dt is None or block_float.size == 0:
            return put(block_float)
        if not hasattr(self, "_repack_jit"):
            self._repack_jit = {}
        widen = self._repack_jit.get(("float", placement))
        if widen is None:
            @partial(jax.jit, out_shardings=placement)
            def widen(x):
                return x.astype(jnp.float32)

            self._repack_jit[("float", placement)] = widen
        return widen(put(block_float.astype(dt)))

    def __len__(self):
        return self.num_batches

    def eval_slots(self, feature_map):
        """(label_col_in_float_block, group_col_in_int_block_or_None) for
        the on-device eval kernel (models/base.py:_cache_eval_slots) —
        this loader packs by the canonical cache_layout."""
        layout = self._layout
        _, lab_lo, _, _ = layout[feature_map.labels[0]]
        gid = getattr(feature_map, "group_id", None)
        g_lo = (layout[gid][1]
                if gid in layout and layout[gid][0] == "int" else None)
        return lab_lo, g_lo

    def eval_label_cols(self, feature_map):
        """Float-block columns of ALL labels (multitask device eval)."""
        return [self._layout[lb][1] for lb in feature_map.labels]

    def cache_refs(self):
        """The device-resident packed blocks, keyed as batch entries."""
        if self.chunked:
            raise ValueError(
                "chunked device cache has no resident blocks; iterate "
                "epoch_chunks()/eval_chunks()")
        return {CACHE_INT_KEY: self._dev_int,
                CACHE_FLOAT_KEY: self._dev_float}

    def _stage_chunk(self, lo, hi):
        """Async-dispatch one chunk's rows to HBM (contiguous row slices of
        the packed host blocks — one wide transfer per block)."""
        import jax
        if not self.chunked:
            return self.cache_refs()
        return {CACHE_INT_KEY: self._put_int_block(self._host_int[lo:hi],
                                                   None),
                CACHE_FLOAT_KEY: self._put_float_block(
                    self._host_float[lo:hi], None)}

    def _row_validity(self, order):
        """-1-mask invalid GLOBAL rows in an order array (numpy).

        Single-host: rows >= _n_valid are padding. Multi-host: each host's
        slice is tail-padded to ``_per_host_rows``, so validity is
        (row %% per) < host_valid[row // per] — computable identically on
        every process."""
        if getattr(self, "_multihost", False):
            per = self._per_host_rows
            nv = self._host_valid[np.minimum(order // per,
                                             self._num_hosts - 1)]
            return np.where((order >= 0) & ((order % per) < nv),
                            order, -1).astype(np.int32)
        return np.where(order < self._n_valid, order, -1).astype(np.int32)

    def _chunk_order(self, lo, hi, epoch, chunk_id, shuffle):
        """Device order over chunk-LOCAL rows, -1-padded to a batch
        multiple."""
        import jax
        n = hi - lo
        nv = int(np.clip(self._n_valid - lo, 0, n))
        padded = int(np.ceil(n / self.batch_size)) * self.batch_size
        if getattr(self, "_multihost", False):
            # every process computes the SAME global permutation (shared
            # seed, shared shapes) host-side, then contributes it as a
            # fully-replicated global array. The device_shuffle jit would
            # also agree (same threefry key), but its output lands
            # process-local; replicating through
            # make_array_from_process_local_data keeps the contract
            # explicit. Order bytes are tiny next to the blocks.
            order = np.arange(n, dtype=np.int32)
            if shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(order)
            order = self._row_validity(order)
            if padded > n:
                order = np.concatenate(
                    [order, np.full(padded - n, -1, np.int32)])
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.make_array_from_process_local_data(
                NamedSharding(self.mesh, P()), order)
        if shuffle and not self.device_shuffle:
            order = np.arange(n, dtype=np.int32)
            seed = (self.seed + epoch if len(self._chunk_bounds) == 1
                    else [self.seed + epoch, chunk_id])
            np.random.default_rng(seed).shuffle(order)
            order = np.where(order < nv, order, -1).astype(np.int32)
            if padded > n:
                order = np.concatenate(
                    [order, np.full(padded - n, -1, np.int32)])
        else:
            key = jax.random.fold_in(
                jax.random.PRNGKey(self.seed + epoch), chunk_id)
            order = _device_order(key, n, nv, padded, bool(shuffle))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            order = jax.device_put(order, NamedSharding(self.mesh, P()))
        elif not hasattr(order, "devices"):
            order = jax.device_put(order)
        return order

    def epoch_chunks(self):
        """One training epoch as (cache_refs, device_order, num_batches)
        chunks. Single-chunk loaders yield the resident blocks; chunked
        loaders rotate super-chunks through HBM, dispatching chunk i+1's
        staging before chunk i trains (the transfer overlaps compute).
        Chunk visit order is shuffled per epoch; rows shuffle within a
        chunk — the same shuffle granularity as the reference's
        block-streaming loader, at super-chunk scale."""
        epoch = self._epoch
        if self.shuffle:
            self._epoch += 1
        ids = np.arange(len(self._chunk_bounds))
        if self.shuffle and len(ids) > 1:
            np.random.default_rng(self.seed + 7919 * (epoch + 1)).shuffle(ids)
        nxt = self._stage_chunk(*self._chunk_bounds[ids[0]])
        for i, ci in enumerate(ids):
            cache = nxt
            if i + 1 < len(ids):
                nxt = self._stage_chunk(*self._chunk_bounds[ids[i + 1]])
            lo, hi = self._chunk_bounds[ci]
            order = self._chunk_order(lo, hi, epoch, int(ci), self.shuffle)
            yield cache, order, int(np.ceil((hi - lo) / self.batch_size)), lo
            del cache

    def eval_chunks(self):
        """Natural-order chunks for evaluation: (cache_refs, num_batches,
        local_valid_rows, base_row). Does not consume the shuffle rng."""
        nxt = self._stage_chunk(*self._chunk_bounds[0])
        for i, (lo, hi) in enumerate(self._chunk_bounds):
            cache = nxt
            if i + 1 < len(self._chunk_bounds):
                nxt = self._stage_chunk(*self._chunk_bounds[i + 1])
            nv = int(np.clip(self._n_valid - lo, 0, hi - lo))
            yield (cache, int(np.ceil((hi - lo) / self.batch_size)), nv, lo)
            del cache

    def epoch_order(self):
        """One (single-chunk) training epoch's row order, padded with -1,
        as a DEVICE array. ``device_shuffle=True`` (default) builds the
        permutation ON DEVICE (jax threefry, keyed seed+epoch) — zero
        bytes cross the wire per epoch, which matters on tunneled backends
        where any large transfer can stall. ``device_shuffle=False``
        reproduces ``__iter__``'s exact numpy stream (loader-parity tests)
        at the cost of one order upload per epoch."""
        epoch = self._epoch
        if self.shuffle:
            self._epoch += 1
        lo, hi = self._chunk_bounds[0]
        return self._chunk_order(lo, hi, epoch, 0, self.shuffle)

    def __iter__(self):
        if getattr(self, "_multihost", False):
            raise ValueError(
                "multi-host device cache has no host-side batch iterator "
                "(labels/rows are process-local slices of a global array); "
                "fit/evaluate drive it through the device epoch and device "
                "metric paths")
        if self.chunked:
            raise ValueError(
                "chunked device cache is driven via epoch_chunks()/"
                "eval_chunks() (fit/evaluate use them automatically); "
                "per-batch iteration would re-stage HBM per batch")
        n = self._n_rows
        order = np.arange(n, dtype=np.int32)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start:start + bs]
            mask = (idx < self._n_valid).astype(np.float32)
            if len(idx) < bs:
                pad = np.full(bs - len(idx), -1, np.int32)
                idx = np.concatenate([idx, pad])
                mask = np.concatenate(
                    [mask, np.zeros(bs - len(mask), np.float32)])
            idx = np.where(mask > 0, idx, -1).astype(np.int32)
            batch = {ROWS_KEY: idx, SAMPLE_MASK_KEY: mask,
                     CACHE_INT_KEY: self._dev_int,
                     CACHE_FLOAT_KEY: self._dev_float,
                     LABELS_KEY: self.host_labels[np.maximum(idx, 0)]}
            if self.host_group is not None:
                batch[GROUP_KEY] = self.host_group[np.maximum(idx, 0)]
            yield batch
