"""Columnar dataset loading.

The reference row-stacks every column into one ``[N, total_cols]`` float array
and re-slices it per batch (/root/reference/fuxictr/pytorch/dataloaders/
parquet_dataloader.py:56-75). On TPU we instead keep a *typed column store*:
one contiguous ndarray per feature with the narrowest safe dtype
(int32 ids, float32 values). This avoids the float64 round-trip (lossy above
2**53, wasteful always), keeps host→device copies minimal, and lets the
embedding layer stack id-columns into a single ``[B, F]`` gather operand.
"""

import glob
import os

import numpy as np

# Key under which the per-sample validity mask is stored in each batch.
# Batches are padded to a fixed batch_size so XLA never retraces; the mask
# weights out padded rows in loss/eval.
SAMPLE_MASK_KEY = "__mask__"


def _feature_dtype(spec):
    t = spec["type"]
    if t in ("categorical", "sequence"):
        return np.int32
    if t in ("numeric", "embedding"):
        return np.float32
    return None  # meta: keep as-is


def load_columns(feature_map, data_path):
    """Load one data file (parquet or npz) into ``{name: ndarray}``.

    Returns arrays of shape [N] (scalar), [N, max_len] (sequence), or
    [N, pretrain_dim] (embedding features), with labels as float32.
    """
    if data_path.endswith(".tfrecord"):
        from fuxictr_tpu.data.tfrecord import load_tfrecord_columns
        return load_tfrecord_columns(feature_map, data_path)
    if data_path.endswith(".npz"):
        raw = np.load(data_path, allow_pickle=True)
        get = lambda col: raw[col]
    else:
        if not os.path.splitext(data_path)[1]:
            data_path += ".parquet"
        import pyarrow as pa
        import pyarrow.parquet as pq
        table = pq.read_table(data_path)

        def get(col):
            arr = table[col].combine_chunks()
            if pa.types.is_list(arr.type) or \
                    pa.types.is_large_list(arr.type):
                # fixed-length sequences (the pipeline pads at build time):
                # flatten arrow buffers directly — orders of magnitude
                # faster than np.array(series.to_list()) at scale
                offsets = np.asarray(arr.offsets)
                lengths = np.diff(offsets)
                flat = arr.flatten().to_numpy(zero_copy_only=False)
                if len(lengths) and np.all(lengths == lengths[0]):
                    return flat.reshape(len(arr), int(lengths[0]))
                max_len = int(lengths.max()) if len(lengths) else 0
                out = np.zeros((len(arr), max_len), flat.dtype)
                for i, (s, e) in enumerate(zip(offsets[:-1], offsets[1:])):
                    out[i, :e - s] = flat[s:e]
                return out
            return arr.to_numpy(zero_copy_only=False)

    columns = {}
    for name, spec in feature_map.features.items():
        arr = np.asarray(get(name))
        dtype = _feature_dtype(spec)
        if dtype is not None:
            arr = np.ascontiguousarray(arr, dtype=dtype)
        columns[name] = arr
    for label in feature_map.labels:
        columns[label] = np.ascontiguousarray(get(label), dtype=np.float32)
    return columns


def expand_path(data_path):
    """Resolve a path that may be a file, glob, or directory of part files."""
    if os.path.isdir(data_path):
        for ext in ("*.parquet", "*.npz", "*.tfrecord"):
            parts = sorted(glob.glob(os.path.join(data_path, ext)))
            if parts:
                return parts
        return []
    if any(ch in data_path for ch in "*?["):
        return sorted(glob.glob(data_path))
    if not os.path.exists(data_path) and os.path.exists(data_path + ".parquet"):
        return [data_path + ".parquet"]
    return [data_path]
