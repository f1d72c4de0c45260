"""Low-latency serving of an exported bundle.

TPU-first design decisions (no reference equivalent — the reference stops
at training, rank_model.py:417-423):

- **Static batch buckets.** XLA compiles one program per input shape, so a
  serve path that sees arbitrary batch sizes retraces. The Predictor pads
  every request up to a fixed bucket (powers of two by default) and
  AOT-compiles each bucket ONCE at startup (`jit(...).lower().compile()`)
  — serve-time dispatch never compiles.
- **Online encoding == offline pipeline.** Raw feature dicts are encoded
  through the SAME FeatureProcessor artifacts the offline build produced
  (tokenizers/normalizers from feature_processor.pkl), so a served row is
  byte-identical to what training saw.
- **Donated-free, pure predict.** The compiled fn closes over nothing
  mutable; weights live on device once.
"""

import json
import os

import flax
import numpy as np

from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models.base import SAMPLE_MASK_KEY


def _infer_table_buckets(param_tree):
    """Infer the table layout of a bundle that predates the layout pin.

    Bundles exported before export.py pinned ``table_size_buckets`` may
    have been built either with the legacy single-table-per-dim layout or
    with the (later-default) size-bucketed one — the window between
    bucketing becoming the default and export pinning it.  The saved param
    names disambiguate: split buckets are named ``table_d{dim}b{k}``
    (ops/embedding.py EmbeddingLayout), which the legacy layout never
    produces.  A bucketed bundle whose fields all land in one bucket keeps
    the legacy name AND the identical rows/offsets, so the legacy fallback
    restores it correctly either way.
    """
    import re

    found = False
    stack = [param_tree]
    while stack:
        node = stack.pop()
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(k, str) and re.fullmatch(r"table_d\d+b\d+", k):
                    found = True
                stack.append(v)
    if found:
        from fuxictr_tpu.ops.embedding import DEFAULT_TABLE_SIZE_BUCKETS
        return list(DEFAULT_TABLE_SIZE_BUCKETS)
    return []


def _bucket_for(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(
        f"request of {n} rows exceeds the largest bucket {buckets[-1]}; "
        f"split the request or configure larger batch_buckets")


class Predictor:
    """Load an export bundle and serve predictions.

    Args:
        export_dir: bundle written by :func:`fuxictr_tpu.serving.export_model`.
        batch_buckets: ascending static batch sizes to AOT-compile.
        aot: compile all buckets at construction (True) or lazily on first
            use of each bucket (False).
    """

    def __init__(self, export_dir, batch_buckets=(1, 8, 64, 512), aot=True,
                 quantize=None, **param_overrides):
        self.export_dir = export_dir
        self.batch_buckets = tuple(sorted(batch_buckets))
        with open(os.path.join(export_dir, "model_meta.json")) as fd:
            meta = json.load(fd)
        self.meta = meta
        params = dict(meta["params"])
        params.update(param_overrides)
        params.setdefault("model_root", os.path.join(export_dir, "_serve"))

        with open(os.path.join(export_dir, "weights.msgpack"), "rb") as fd:
            blob = flax.serialization.msgpack_restore(fd.read())

        # bundles exported before 0.4.0 carry no table-layout pin; the
        # layout they were ACTUALLY built with (legacy single-table-per-dim
        # vs size-bucketed, which became the default before export started
        # pinning it) is inferred from the saved param names — see
        # _infer_table_buckets. export.py pins the layout explicitly for
        # every new bundle. (docs/SERVING.md "Migration")
        if "table_size_buckets" not in params:
            params["table_size_buckets"] = _infer_table_buckets(
                blob.get("params", {}))
        if quantize:
            if params.get("table_dtype") == quantize:
                quantize = None     # bundle is already quantized (export-
                                    # time quantize): plain restore below
            else:
                # float bundle: int8 tables + per-row scales built here at
                # load time (serving/quantize.py)
                params["table_dtype"] = quantize
        self.quantize = quantize

        self.feature_map = FeatureMap(
            meta.get("dataset_id", params.get("dataset_id", "serving")),
            export_dir)
        self.feature_map.load(
            os.path.join(export_dir, "feature_map.json"), params)

        from fuxictr_tpu.models import get_model
        self.model = get_model(meta["model"])(self.feature_map, **params)
        self.model.init_params()

        import jax
        state = self.model.state
        if self.quantize:
            from fuxictr_tpu.serving.quantize import quantize_param_tree
            new_params = quantize_param_tree(
                blob["params"], jax.device_get(state.params))
        else:
            new_params = flax.serialization.from_state_dict(
                jax.device_get(state.params), blob["params"])
        self.model.state = state.replace(
            params=new_params,
            model_state=flax.serialization.from_state_dict(
                jax.device_get(state.model_state), blob["model_state"]))
        # stage weights once; serve-time calls only move the request batch
        self.model.state = jax.device_put(self.model.state)

        self._predict_fn = self.model._make_predict_step()
        self._compiled = {}
        self._processor = None
        if aot:
            for b in self.batch_buckets:
                self._compile_bucket(b)

    # ------------------------------------------------------------- encode
    @property
    def processor(self):
        """Lazy-loaded offline FeatureProcessor for online encoding."""
        if self._processor is None:
            pkl = os.path.join(self.export_dir, "feature_processor.pkl")
            if not os.path.exists(pkl):
                raise FileNotFoundError(
                    "bundle has no feature_processor.pkl — export with "
                    "include_processor=True to enable online encoding")
            import pickle
            with open(pkl, "rb") as fd:
                self._processor = pickle.load(fd)
        return self._processor

    def encode(self, raw_features):
        """Raw feature dict-of-lists (or DataFrame) → encoded column arrays
        via the offline pipeline's exact tokenizers/normalizers."""
        import pandas as pd
        df = raw_features if isinstance(raw_features, pd.DataFrame) \
            else pd.DataFrame(raw_features)
        fp = self.processor
        # serve-time payloads carry raw JSON types; coerce each column to
        # the dtype the offline csv/parquet reader declared (a str-typed
        # categorical tokenized as "123" must not arrive here as int 123)
        df = df.copy()
        for name, dtype in fp.dtype_dict.items():
            if name not in df.columns or dtype is object:
                continue
            col = df[name]
            try:
                if dtype is str and pd.api.types.is_numeric_dtype(col):
                    # a str-typed categorical arriving as numbers: NaN made
                    # pandas infer float, and astype(str) would yield "123.0"
                    # where the offline csv reader tokenized "123" — route
                    # integral floats through nullable Int64 first
                    if pd.api.types.is_float_dtype(col):
                        finite = col.dropna()
                        if len(finite) == 0 or (finite % 1 == 0).all():
                            col = col.astype("Int64")
                    col = col.astype(str).where(col.notna(), np.nan)
                    df[name] = col
                else:
                    df[name] = col.astype(dtype)
            except (TypeError, ValueError):
                pass  # leave as-is; preprocess() fill_na handles nulls
        df = fp.preprocess(df)
        out = fp.transform(df)
        return {c: np.asarray(v) for c, v in out.items()}

    # ------------------------------------------------------------ predict
    def _example_batch(self, batch_size):
        return self.model._example_batch(batch_size)

    def _compile_bucket(self, b):
        # _make_predict_step returns a jax.jit-wrapped fn: AOT-lower it at
        # this bucket's static shapes so serve-time calls never compile
        example = self._example_batch(b)
        self._compiled[b] = self._predict_fn.lower(
            self.model.state, example).compile()
        return self._compiled[b]

    def predict(self, batch):
        """Predict probabilities for an encoded batch (dict of np arrays).

        Pads to the nearest batch bucket; returns [n] (or [n, n_tasks])
        float32 probabilities for the n request rows only.
        """
        first = next(iter(batch.values()))
        n = int(np.shape(first)[0])
        b = _bucket_for(n, self.batch_buckets)
        padded = {}
        for key, col in batch.items():
            arr = np.asarray(col)
            if arr.shape[0] != n:
                raise ValueError(f"column {key} has {arr.shape[0]} rows, "
                                 f"expected {n}")
            pad = [(0, b - n)] + [(0, 0)] * (arr.ndim - 1)
            padded[key] = np.pad(arr, pad)
        # label columns may be absent at serve time — zero-fill
        example = self._example_batch(b)
        for key, col in example.items():
            padded.setdefault(key, np.zeros_like(col))
        padded[SAMPLE_MASK_KEY] = np.concatenate(
            [np.ones(n, np.float32), np.zeros(b - n, np.float32)])
        fn = self._compiled.get(b) or self._compile_bucket(b)
        y = np.asarray(fn(self.model.state, padded))
        y = y[:n]
        return y.reshape(-1) if y.ndim == 2 and y.shape[1] == 1 else y

    def predict_raw(self, raw_features):
        """predict() over raw (untokenized) features via encode()."""
        return self.predict(self.encode(raw_features))
