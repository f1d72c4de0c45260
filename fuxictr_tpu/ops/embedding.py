"""Fused feature embeddings.

The reference keeps one ``nn.Embedding`` per field and loops over a dict
(/root/reference/fuxictr/pytorch/layers/embeddings/feature_embedding.py:91-297).
On TPU that would issue one small gather per field — poor HBM utilisation and
a long dispatch chain. Here all categorical/sequence vocabularies that share
an embedding dim are concatenated into ONE ``[total_rows, dim]`` table with
per-field row offsets (the schema already carries ``total_features``), so a
batch lookup is a single large gather that XLA can vectorise and — with a
``NamedSharding`` over the rows — shard across the ``model`` mesh axis.

Semantics preserved from the reference:
  - ``share_embedding`` fields alias the owner field's rows.
  - ``padding_idx`` rows read as zeros and receive no gradient (output mask).
  - numeric fields are a per-field dim-d weight vector (Linear(1, d)).
  - ``embedding``-type fields pass through with a Dense projection.
  - per-field ``feature_encoder`` strings are parsed by an explicit registry
    (never ``eval``).
  - pretrained embeddings (init/sum/concat usage, freeze) via own-table path.
"""

import os
import re
from collections import OrderedDict
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fuxictr_tpu.config import not_in_whitelist
from fuxictr_tpu.ops.common import get_initializer, xavier_normal
from fuxictr_tpu.ops.pooling import masked_average_pool, masked_sum_pool

# batch-dict key carrying the dedup inverse index (data/longctr_loader.py)
INVERSE_KEY = "__item_inverse__"


# ------------------------------------------------------------------ layout
# Fused tables are partitioned into SIZE BUCKETS by field vocab size.
# Measured physics (BENCHMARKS.md "Gather/scatter cost scales with TABLE
# SIZE"): per-row gather cost from a 2.6M-row table is ~8x the cost from a
# 100k-row table (DMA stride), and scatter-add shows the same ~5x effect —
# so packing small-vocab fields into the same table as multi-million-row
# fields makes 85% of the gathered rows pay big-table prices. Bucketing by
# vocab size (tiny <= 8k, mid <= 128k, big) cuts the Criteo-shaped
# embedding train path 15.6 -> 7.0 ms/step (scripts/bench_table_split.py).
DEFAULT_TABLE_SIZE_BUCKETS = (8192, 131072)


class EmbeddingLayout:
    """Static (host-side) description of the fused-table packing.

    ``size_buckets``: ascending vocab-size edges partitioning each
    dim-group into separate tables (see above). Resolution order:
    explicit arg > ``feature_map.table_size_buckets`` (set from the model
    config by RankModel) > module default. ``()`` disables bucketing
    (one fused table per dim, the round-1 layout). A dim whose fields all
    land in one bucket keeps the legacy param name ``table_d{dim}``;
    otherwise buckets are named ``table_d{dim}b{k}`` in ascending
    bucket order.
    """

    def __init__(self, feature_map, embedding_dim, required=None,
                 not_required=None, use_pretrain=True, use_sharing=True,
                 force_dim=None, size_buckets=None):
        self.feature_map = feature_map
        if size_buckets is None:
            size_buckets = getattr(feature_map, "table_size_buckets", None)
        if size_buckets is None:
            size_buckets = DEFAULT_TABLE_SIZE_BUCKETS
        self.size_buckets = tuple(sorted(size_buckets))
        self.fields = OrderedDict()   # name -> field plan
        self.tables = OrderedDict()   # table name -> {"rows", "dim"}
        self.numeric = {}             # dim -> [field names]
        vocab_offset = {}             # (dim, bucket) -> running row count

        def bucket_of(vocab_size):
            for i, edge in enumerate(self.size_buckets):
                if vocab_size <= edge:
                    return i
            return len(self.size_buckets)

        for name, spec in feature_map.features.items():
            ftype = spec["type"]
            if ftype == "meta":
                continue
            if required and name not in required:
                continue
            if not_required and name in not_required:
                continue
            dim = force_dim or spec.get("embedding_dim", embedding_dim)
            plan = {"type": ftype, "dim": dim, "spec": spec}
            if ftype == "numeric":
                plan["numeric_index"] = len(self.numeric.setdefault(dim, []))
                self.numeric[dim].append(name)
            elif ftype in ("categorical", "sequence"):
                if use_pretrain and "pretrained_emb" in spec:
                    plan["pretrained"] = True   # own-table path
                else:
                    owner = spec.get("share_embedding") if use_sharing else None
                    if owner and owner in self.fields \
                            and "offset" in self.fields[owner]:
                        plan["offset"] = self.fields[owner]["offset"]
                        plan["bucket"] = self.fields[owner]["bucket"]
                    else:
                        key = (dim, bucket_of(spec["vocab_size"]))
                        off = vocab_offset.setdefault(key, 0)
                        plan["offset"] = off
                        plan["bucket"] = key[1]
                        vocab_offset[key] = off + spec["vocab_size"]
                plan["padding_idx"] = spec.get("padding_idx", -1)
                if plan["padding_idx"] is None:
                    plan["padding_idx"] = -1
            elif ftype == "embedding":
                plan["pretrain_dim"] = spec.get("pretrain_dim", dim)
            self.fields[name] = plan

        # name the tables: legacy name when a dim has a single bucket
        buckets_by_dim = {}
        for (dim, b) in vocab_offset:
            buckets_by_dim.setdefault(dim, []).append(b)
        table_name = {}
        for dim, bs in buckets_by_dim.items():
            bs = sorted(bs)
            for k, b in enumerate(bs):
                name = (f"table_d{dim}" if len(bs) == 1
                        else f"table_d{dim}b{k}")
                table_name[(dim, b)] = name
                self.tables[name] = {"rows": vocab_offset[(dim, b)],
                                     "dim": dim}
        for plan in self.fields.values():
            if "bucket" in plan:
                plan["table"] = table_name[(plan["dim"], plan["bucket"])]



# ------------------------------------------------------ encoder mini-parser
_ENCODER_RE = re.compile(
    r"^(?:layers\.)?(MaskedAveragePooling|MaskedSumPooling)\(\)$")
_LINEAR_RE = re.compile(
    r"^nn\.Linear\((\d+),\s*(\d+)(?:,\s*bias=(True|False))?\)$")


def parse_feature_encoder(enc):
    """Parse a feature_encoder config string into a descriptor list."""
    if enc is None:
        return []
    encs = enc if isinstance(enc, list) else [enc]
    out = []
    for e in encs:
        m = _ENCODER_RE.match(e.strip())
        if m:
            out.append(("pool", "average" if "Average" in m.group(1) else "sum"))
            continue
        m = _LINEAR_RE.match(e.strip())
        if m:
            out.append(("linear", int(m.group(2)), m.group(3) != "False"))
            continue
        raise ValueError(f"feature_encoder={e} is not supported.")
    return out


# ----------------------------------------------------------- pretrained io
def load_pretrain_emb(path, keys=("key", "value")):
    """Load a pretrained embedding {id: vector} pair from npz/parquet/h5."""
    if path.endswith(".h5"):
        import h5py
        with h5py.File(path, "r") as hf:
            return np.array(hf[keys[0]]), np.array(hf[keys[1]])
    if path.endswith(".npz"):
        d = np.load(path, allow_pickle=True)
        return d[keys[0]], d[keys[1]]
    import pandas as pd
    df = pd.read_parquet(path)
    return df[keys[0]].to_numpy(), np.array(df[keys[1]].to_list())


# ---------------------------------------------------------- fast gather
def table_gather(table, ids):
    """Embedding row gather — the single interception point for the
    embedding hot path (sharded/Pallas backends slot in here).

    Measured on v5e (BENCHMARKS.md): XLA's native gather/scatter pair is
    the practical optimum for narrow rows — sorted-dedupe backward
    (:func:`table_gather_dedup`) and per-row DMA kernels are no faster, so
    the default stays on the autodiff path.
    """
    return jnp.take(table, ids, axis=0)


@jax.custom_vjp
def table_gather_expand(table, ids, inv):
    """Deduped lookup ``table[ids][inv]`` with a single-scatter backward.

    On v5e, BOTH gather and scatter per-row cost grow with the table size
    (measured, BENCHMARKS.md: 1M-row scatter-add is 142ms into a 2.6M-row
    table but 26.6ms into a 64k temp; 64k unique rows into the 2.6M table
    is 19.9ms).  So the forward gathers only the few unique rows (``ids``,
    bucket-padded by the loader) from the big table and expands through the
    small temp, and the backward segment-sums [len(inv)] rows into the
    temp, then scatters the unique rows into the table — ~4x faster than
    the single duplicated scatter the plain autodiff path issues.
    """
    return jnp.take(jnp.take(table, ids, axis=0), inv, axis=0)


def _tge_fwd(table, ids, inv):
    out = jnp.take(jnp.take(table, ids, axis=0), inv, axis=0)
    return out, (table, ids, inv)


def _tge_bwd(res, g):
    table, ids, inv = res
    seg = jnp.zeros((ids.shape[0],) + g.shape[1:], g.dtype).at[inv].add(g)
    grad = jnp.zeros_like(table).at[ids].add(seg.astype(table.dtype))
    return grad, None, None


table_gather_expand.defvjp(_tge_fwd, _tge_bwd)


def _tgem_uniq(table, ids_stack, mask_stack):
    return jnp.concatenate(
        [jnp.take(table, ids_stack[i], axis=0)
         * mask_stack[i][:, None].astype(table.dtype)
         for i in range(ids_stack.shape[0])], axis=-1)       # [U, k*D]


@jax.custom_vjp
def table_gather_expand_multi(table, ids_stack, inv, mask_stack):
    """k-field deduped lookup from ONE fused table, ONE expand.

    ``ids_stack`` [k, U] holds each field's offset-shifted unique row ids
    and ``mask_stack`` [k, U] the padding masks (applied at unique level —
    cheaper than masking the expanded rows, and equivalent because the
    expansion is a pure row-select). Returns [len(inv), k*D].
    Expand-take and its segment-sum backward are ROW-COUNT bound on v5e
    (a [1M, 32] and a [1M, 64] take both cost ~6.5 ms — BENCHMARKS.md), so
    k fields expanded together cost one field's expand instead of k.
    Backward: one [len(inv)]-row segment-sum into the [U, k*D] temp, then
    k unique-row scatters into the table.
    """
    return jnp.take(_tgem_uniq(table, ids_stack, mask_stack), inv, axis=0)


def _tgem_fwd(table, ids_stack, inv, mask_stack):
    out = jnp.take(_tgem_uniq(table, ids_stack, mask_stack), inv, axis=0)
    return out, (table, ids_stack, inv, mask_stack)


def _tgem_bwd(res, g):
    table, ids_stack, inv, mask_stack = res
    k = ids_stack.shape[0]
    U = ids_stack.shape[1]
    D = g.shape[-1] // k
    seg = jnp.zeros((U, g.shape[-1]), g.dtype).at[inv].add(g)
    grad = jnp.zeros_like(table)
    for i in range(k):
        grad = grad.at[ids_stack[i]].add(
            (seg[:, i * D:(i + 1) * D]
             * mask_stack[i][:, None]).astype(table.dtype))
    return grad, None, None, None


table_gather_expand_multi.defvjp(_tgem_fwd, _tgem_bwd)


@jax.custom_vjp
def table_gather_dedup(table, ids):
    """Gather whose backward sorts ids and segment-sums duplicates into one
    conflict-free scatter. Useful when id duplication is extreme (e.g.
    heavy-hitter vocabularies); numerics identical to autodiff."""
    return jnp.take(table, ids, axis=0)


def _table_gather_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (table.shape[0], ids)


def _table_gather_bwd(res, g):
    num_rows, ids = res
    d = g.shape[-1]
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, d)
    order = jnp.argsort(flat_ids)
    sid = jnp.take(flat_ids, order)
    sg = jnp.take(flat_g, order, axis=0)
    change = jnp.concatenate(
        [jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(change) - 1                       # compacted slot ids
    summed = jax.ops.segment_sum(sg, seg, num_segments=sid.shape[0])
    # slot -> row id (all writes within a segment carry the same value);
    # slots past the last unique id keep the OOB sentinel and are dropped
    slot_rows = jnp.full((sid.shape[0],), num_rows, sid.dtype)
    slot_rows = slot_rows.at[seg].set(sid)
    dtable = jnp.zeros((num_rows, d), g.dtype).at[slot_rows].add(
        summed, mode="drop", unique_indices=True)
    return dtable, None


table_gather_dedup.defvjp(_table_gather_fwd, _table_gather_bwd)


# ----------------------------------------------------------------- module
class FeatureEmbedding(nn.Module):
    """Unified embedding front-end: batch dict → dict / [B, F, D] / [B, F*D]."""

    feature_map: Any
    embedding_dim: int
    embedding_initializer: str = "normal(std=1e-4)"
    required_feature_columns: Sequence[str] = None
    not_required_feature_columns: Sequence[str] = None
    use_pretrain: bool = True
    use_sharing: bool = True
    force_dim: int = None          # e.g. 1 for LogisticRegression weights
    pool_sequences: str = None     # "sum"/"average": pool all sequence fields
    size_buckets: Sequence[int] = None  # see EmbeddingLayout.size_buckets
    seq_slice_gather: bool = None  # sequence fields gather via a
    #   materialized vocab-slice temp when vocab < flat id count (see
    #   _lookup_fused). None: resolve from feature_map (default True).
    table_dtype: str = None        # "int8": serving-only quantized tables
    #   (per-row symmetric scales; gather int8 rows + [*, 1] scales, multiply
    #   after the gather — 4x less HBM and 4x fewer gather bytes, the
    #   byte-proportional cost measured in BENCHMARKS.md round 1). Resolution
    #   order mirrors size_buckets: explicit attr > feature_map.table_dtype.

    def setup(self):
        self.layout = EmbeddingLayout(
            self.feature_map, self.embedding_dim,
            required=self.required_feature_columns,
            not_required=self.not_required_feature_columns,
            use_pretrain=self.use_pretrain, use_sharing=self.use_sharing,
            force_dim=self.force_dim, size_buckets=self.size_buckets)
        init = get_initializer(self.embedding_initializer)
        tdt = self.table_dtype or getattr(self.feature_map,
                                          "table_dtype", None)
        if tdt not in (None, "float32", "fp32", "int8"):
            raise NotImplementedError(
                f"table_dtype={tdt} is not supported (int8 only)")
        self.quantized = tdt == "int8"
        tables = {}
        scales = {}
        for tname, info in self.layout.tables.items():
            if self.quantized:
                tables[tname] = self.param(
                    tname, lambda key, shape: jnp.zeros(shape, jnp.int8),
                    (info["rows"], info["dim"]))
                scales[tname] = self.param(
                    tname + "_scale", jax.nn.initializers.ones,
                    (info["rows"], 1))
            else:
                tables[tname] = self.param(tname, init,
                                           (info["rows"], info["dim"]))
        self.tables = tables
        self.table_scales = scales
        numeric_ws = {}
        for dim, names in self.layout.numeric.items():
            # per-field Linear(1, dim) weights, xavier-normal over fan (1, dim)
            std = float(np.sqrt(2.0 / (1 + dim)))
            numeric_ws[dim] = self.param(
                f"numeric_d{dim}", jax.nn.initializers.normal(stddev=std),
                (len(names), dim))
        self.numeric_ws = numeric_ws

        encoders = {}
        projections = {}
        pretrained = {}
        for name, plan in self.layout.fields.items():
            spec = plan["spec"]
            descs = parse_feature_encoder(spec.get("feature_encoder"))
            if descs:
                mods = []
                for i, d in enumerate(descs):
                    if d[0] == "linear":
                        mods.append((d[0], nn.Dense(
                            d[1], use_bias=d[2], kernel_init=xavier_normal(),
                            name=f"enc_{name}_{i}")))
                    else:
                        mods.append(d)
                encoders[name] = mods
            elif plan["type"] == "embedding":
                projections[name] = nn.Dense(
                    plan["dim"], use_bias=False, kernel_init=xavier_normal(),
                    name=f"proj_{name}")
            if plan.get("pretrained"):
                pretrained[name] = self._make_pretrained(name, plan, init)
        self.encoders = encoders
        self.projections = projections
        self.pretrained = pretrained

    def _make_pretrained(self, name, plan, default_init):
        """Own-table path for a field with pretrained vectors.

        Returns (table_param, frozen, usage, proj?) — cf. reference
        pretrained_embedding.py:30-189 (init/sum/concat usage, freeze).
        """
        spec = plan["spec"]
        usage = spec.get("pretrain_usage", "init")
        freeze = spec.get("freeze_emb", False)
        dim = plan["dim"]
        pretrain_dim = spec.get("pretrain_dim", dim)
        path = os.path.join(self.feature_map.data_dir, spec["pretrained_emb"])
        vocab_size = spec["vocab_size"]
        oov_idx = spec.get("oov_idx", vocab_size - 1)

        def pretrained_init(key, shape):
            keys, values = load_pretrain_emb(path)
            table = np.zeros(shape, dtype=np.float32)
            filled = np.zeros((shape[0], 1), dtype=bool)
            idx = np.asarray(keys).astype(np.int64)
            ok = (idx >= 0) & (idx < vocab_size)
            table[idx[ok]] = np.asarray(values)[ok]
            filled[idx[ok]] = True
            out = jnp.asarray(table)
            if usage == "init":
                # rows absent from the pretrained file get the default init
                # (works under jit tracing — no numpy conversion of tracers)
                base = default_init(key, shape, jnp.float32)
                out = jnp.where(jnp.asarray(filled), out, base)
            return out

        entry = {"usage": usage, "freeze": freeze, "oov_idx": oov_idx,
                 "padding_idx": plan["padding_idx"]}
        entry["pre_table"] = self.param(
            f"pretrain_{name}", pretrained_init, (vocab_size, pretrain_dim))
        if usage in ("sum", "concat") or (usage == "init" and freeze):
            pass
        if usage in ("sum", "concat"):
            entry["id_table"] = self.param(
                f"table_{name}", get_initializer(self.embedding_initializer),
                (vocab_size, dim))
        if usage == "concat" or (usage != "concat" and pretrain_dim != dim):
            in_dim = pretrain_dim + dim if usage == "concat" else pretrain_dim
            entry["proj"] = nn.Dense(dim, use_bias=False,
                                     kernel_init=xavier_normal(),
                                     name=f"pretrain_proj_{name}")
        return entry

    # ------------------------------------------------------------- lookups
    def _sow_touched(self, tname, global_ids):
        """Record which fused-table rows this step gathers (collection
        ``touched_rows``, mirroring the param tree) — consumed by the
        opt-in lazy-adam row updates in models/base.py. No-op unless the
        caller makes the collection mutable."""
        self.sow("touched_rows", tname, global_ids.reshape(-1))

    def _seq_slice_enabled(self):
        att = self.seq_slice_gather
        if att is None:
            att = getattr(self.feature_map, "seq_slice_gather", True)
        return bool(att)

    def _lookup_fused(self, batch, plan, name, inv=None):
        table = self.tables[plan["table"]]
        ids = jnp.asarray(batch[name]).astype(jnp.int32)
        gids = ids + plan["offset"]
        self._sow_touched(plan["table"], gids)
        vocab = int(plan["spec"].get("vocab_size") or 0)
        if (inv is None and plan["type"] == "sequence"
                and 0 < vocab < ids.size and self._seq_slice_enabled()):
            # vocab-slice gather (VERDICT r4 #2): the [B, L] history flat id
            # count exceeds the field's whole vocab (measured Amazon-scale:
            # 206k flat ids vs 63k items / 802 cates, dup 6x / 94x), and a
            # gather's per-row cost grows with the SOURCE table size
            # (BENCHMARKS.md: 2M rows cost 5.9ms from a 10k-row table vs
            # 49.4ms from 2.6M rows). So materialize the field's contiguous
            # vocab rows once (a V-row copy behind an optimization_barrier
            # so XLA cannot fuse it back into a big-table gather) and issue
            # the [B, L] gather + its scatter backward against the small
            # temp; the slice's own backward is a contiguous block write.
            # Numerics identical to the direct path.
            temp = jax.lax.optimization_barrier(
                jax.lax.dynamic_slice_in_dim(table, plan["offset"], vocab,
                                             axis=0))
            rows = table_gather(temp, ids)
            if self.quantized:
                sct = jax.lax.optimization_barrier(
                    jax.lax.dynamic_slice_in_dim(
                        self.table_scales[plan["table"]], plan["offset"],
                        vocab, axis=0))
                sc = table_gather(sct, ids)
                rows = rows.astype(sc.dtype) * sc
        elif inv is None:
            rows = table_gather(table, gids)
            if self.quantized:
                sc = table_gather(self.table_scales[plan["table"]], gids)
                rows = rows.astype(sc.dtype) * sc
        else:   # loader-deduped dict: ids are unique, inv expands them
            rows = table_gather_expand(table, gids, inv)
            if self.quantized:
                sc = table_gather_expand(
                    self.table_scales[plan["table"]], gids, inv)
                rows = rows.astype(sc.dtype) * sc
            ids = jnp.take(ids, inv, axis=0)
        pad = plan["padding_idx"]
        if pad >= 0:
            rows = rows * (ids != pad)[..., None].astype(rows.dtype)
        return rows

    def _lookup_pretrained(self, batch, plan, name):
        entry = self.pretrained[name]
        ids = batch[name].astype(jnp.int32)
        # ids beyond oov collapse to oov (reference masks inputs <= oov_idx)
        pre = jnp.take(entry["pre_table"], jnp.minimum(ids, entry["oov_idx"]),
                       axis=0)
        if entry["freeze"]:
            pre = jax.lax.stop_gradient(pre)
        usage = entry["usage"]
        if usage == "init":
            out = pre
        else:
            own = jnp.take(entry["id_table"], ids, axis=0)
            if usage == "sum":
                if "proj" in entry:
                    pre = entry["proj"](pre)
                out = pre + own
            else:  # concat
                out = jnp.concatenate([pre, own], axis=-1)
        if "proj" in entry and usage != "sum":
            out = entry["proj"](out)
        pad = entry["padding_idx"]
        if pad >= 0:
            out = out * (ids != pad)[..., None].astype(out.dtype)
        return out

    def _groupable_fields(self, batch, feature_source, feature_type):
        """Plain fused scalar categorical fields eligible for a stacked
        per-table op, grouped by table name, with their global ids and
        padding masks pre-built. Shared by the deduped and plain grouped
        lookup paths so both always select the same field set."""
        by_table = {}
        for name, plan in self.layout.fields.items():
            spec = plan["spec"]
            if (name not in batch or plan["type"] != "categorical"
                    or "offset" not in plan or plan.get("pretrained")
                    or name in self.encoders):
                continue
            if jnp.ndim(batch[name]) != 1:
                continue        # scalar fields only (sequences go per-field)
            if feature_source and not_in_whitelist(spec.get("source"),
                                                   feature_source):
                continue
            if feature_type and not_in_whitelist(plan["type"], feature_type):
                continue
            by_table.setdefault(plan["table"], []).append((name, plan))
        groups = {}
        for tname, fields in by_table.items():
            if len(fields) < 2:
                continue        # single field: plain fused path is enough
            ids, masks = [], []
            for name, plan in fields:
                local = jnp.asarray(batch[name]).astype(jnp.int32)
                ids.append(local + plan["offset"])
                pad = plan["padding_idx"]
                masks.append((local != pad) if pad >= 0
                             else jnp.ones_like(local, jnp.bool_))
            groups[tname] = (fields, ids, masks)
        return groups

    def _grouped_expand(self, batch, inv, feature_source, feature_type):
        """Deduped dicts: expand all plain fused-categorical fields of a
        table through ONE table_gather_expand_multi call (row-count-bound
        op — k fields for the price of one; see the op's docstring)."""
        out = {}
        for tname, (fields, ids, masks) in self._groupable_fields(
                batch, feature_source, feature_type).items():
            table = self.tables[tname]
            dim = fields[0][1]["dim"]
            ids_stack, mask_stack = jnp.stack(ids), jnp.stack(masks)
            self._sow_touched(tname, ids_stack)
            emb = table_gather_expand_multi(
                table, ids_stack, inv, mask_stack)  # [len(inv), k*dim]
            sc = None
            if self.quantized:
                sc = table_gather_expand_multi(
                    self.table_scales[tname], ids_stack, inv,
                    mask_stack)                     # [len(inv), k*1]
                emb = emb.astype(sc.dtype)
            for i, (name, plan) in enumerate(fields):
                col = emb[:, i * dim:(i + 1) * dim]
                out[name] = col if sc is None else col * sc[:, i:i + 1]
        return out

    def _grouped_gather(self, batch, feature_source, feature_type):
        """Plain (non-deduped) path: ONE stacked [B, F] gather per fused
        table for all eligible scalar categorical fields, instead of one
        gather per field. Combined with size-bucketed tables this is the
        hot embedding path (scripts/bench_table_split.py)."""
        out = {}
        for tname, (fields, ids, masks) in self._groupable_fields(
                batch, feature_source, feature_type).items():
            table = self.tables[tname]
            ids = jnp.stack(ids, axis=1)           # [B, F]
            mask = jnp.stack(masks, axis=1)        # [B, F]
            self._sow_touched(tname, ids)
            emb = table_gather(table, ids)         # [B, F, D]
            if self.quantized:
                sc = table_gather(self.table_scales[tname], ids)  # [B, F, 1]
                emb = emb.astype(sc.dtype) * sc
            emb = emb * mask[..., None].astype(emb.dtype)
            for i, (name, plan) in enumerate(fields):
                out[name] = emb[:, i, :]
        return out

    def embedding_dict(self, batch, feature_source=(), feature_type=(),
                       train=False):
        """OrderedDict of per-field embeddings: [B, D] or [B, L, D]."""
        out = OrderedDict()
        # loader-deduped dicts (data/longctr_loader.py) carry unique rows +
        # an inverse index; every field expands back to the flat layout
        inv = batch.get(INVERSE_KEY)
        if inv is not None:
            inv = jnp.asarray(inv)
            grouped = self._grouped_expand(batch, inv, feature_source,
                                           feature_type)
        else:
            grouped = self._grouped_gather(batch, feature_source,
                                           feature_type)
        for name, plan in self.layout.fields.items():
            spec = plan["spec"]
            if name not in batch:   # partial dicts (e.g. LongCTR item tables)
                continue
            if feature_source and not_in_whitelist(spec.get("source"),
                                                   feature_source):
                continue
            if feature_type and not_in_whitelist(plan["type"], feature_type):
                continue
            if plan["type"] == "numeric":
                w = self.numeric_ws[plan["dim"]][plan["numeric_index"]]
                x = batch[name].astype(jnp.float32).reshape(-1, 1)
                emb = x * w[None, :]
                if inv is not None:
                    emb = jnp.take(emb, inv, axis=0)
            elif plan["type"] == "embedding":
                emb = batch[name].astype(jnp.float32)
                if name in self.projections and name not in self.encoders:
                    emb = self.projections[name](emb)
                if inv is not None:
                    emb = jnp.take(emb, inv, axis=0)
            elif plan.get("pretrained"):
                emb = self._lookup_pretrained(batch, plan, name)
                if inv is not None:
                    emb = jnp.take(emb, inv, axis=0)
            elif name in grouped:
                emb = grouped[name]
            else:
                emb = self._lookup_fused(batch, plan, name, inv=inv)
            if plan["type"] == "sequence":
                mask = batch[name] != max(plan["padding_idx"], 0)
                emb = self._encode_sequence(name, emb, mask)
            elif name in self.encoders:
                emb = self._apply_encoders(name, emb, None)
            out[name] = emb
        return out

    def _encode_sequence(self, name, emb, mask):
        if name in self.encoders:
            return self._apply_encoders(name, emb, mask)
        if self.pool_sequences == "sum":
            return masked_sum_pool(emb, mask)
        if self.pool_sequences == "average":
            return masked_average_pool(emb, mask)
        return emb  # [B, L, D]; model consumes the sequence directly

    def _apply_encoders(self, name, emb, mask):
        for desc in self.encoders[name]:
            if desc[0] == "pool":
                m = mask if mask is not None else jnp.any(emb != 0, axis=-1)
                emb = (masked_average_pool(emb, m) if desc[1] == "average"
                       else masked_sum_pool(emb, m))
                mask = None
            else:
                emb = desc[1](emb)
        return emb

    def dict2tensor(self, emb_dict, flatten_emb=False, feature_list=(),
                    feature_source=(), feature_type=()):
        """Stack [B, F, D] (equal dims) or concat [B, sum D] per filters."""
        arrs = []
        for name, plan in self.layout.fields.items():
            spec = plan["spec"]
            if feature_list and not_in_whitelist(name, feature_list):
                continue
            if feature_source and not_in_whitelist(spec.get("source"),
                                                   feature_source):
                continue
            if feature_type and not_in_whitelist(plan["type"], feature_type):
                continue
            if name in emb_dict:
                a = emb_dict[name]
                if a.ndim == 3:
                    # unpooled sequence: masked-average with zero-row-inferred
                    # mask (reference MaskedAveragePooling, pooling.py:23) so
                    # flat consumers see one [B, D] vector per field
                    a = masked_average_pool(a, jnp.any(a != 0, axis=-1))
                arrs.append(a)
        if flatten_emb:
            return jnp.concatenate([a.reshape(a.shape[0], -1) for a in arrs],
                                   axis=-1)
        return jnp.stack(arrs, axis=1)

    def __call__(self, batch, feature_source=(), feature_type=(),
                 flatten_emb=False, train=False):
        emb_dict = self.embedding_dict(batch, feature_source=feature_source,
                                       feature_type=feature_type, train=train)
        return self.dict2tensor(emb_dict, flatten_emb=flatten_emb,
                                feature_source=feature_source,
                                feature_type=feature_type)

    def sequence_mask(self, batch, name):
        """Valid-position mask for a sequence field: ids != padding_idx."""
        pad = self.feature_map.features[name].get("padding_idx", 0) or 0
        return batch[name] != pad
