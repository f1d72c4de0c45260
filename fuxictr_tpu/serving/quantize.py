"""Post-training int8 quantization of embedding tables (serving-only).

Per-row symmetric quantization: q = round(w / s) with s = max|row| / 127.
The serving gather reads int8 rows + a [rows, 1] f32 scale — 4x less HBM
than f32 tables and 4x fewer gathered bytes (the gather leg's cost is
byte-proportional; BENCHMARKS.md round 1). Training always stays float;
models/base.py fit() rejects quantized tables.

No reference equivalent (the reference stops at training state_dicts,
rank_model.py:417-423).
"""

import flax
import jax
import numpy as np


def quantize_row_int8(w):
    """[rows, dim] float → (int8 [rows, dim], f32 scale [rows, 1])."""
    w = np.asarray(w, np.float32)
    scale = np.max(np.abs(w), axis=1, keepdims=True) / 127.0
    scale = np.maximum(scale, 1e-12).astype(np.float32)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_param_tree(f32_params, q_template):
    """Fill an int8 param template from float weights.

    Args:
        f32_params: nested dict of float weights (the trained tree).
        q_template: the quantized model's param tree (int8 table leaves +
            ``*_scale`` siblings, from ``init_params()`` with
            table_dtype="int8").
    Returns a tree with the template's structure: float leaves copied from
    ``f32_params``, int8 leaves quantized, scale leaves computed.
    """
    flat_f32 = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(f32_params))
    flat_q = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(q_template))
    out = {}
    for path, leaf in flat_q.items():
        if np.asarray(leaf).dtype == np.int8:
            src = flat_f32[path]
            q, scale = quantize_row_int8(src)
            if q.shape != np.asarray(leaf).shape:
                raise ValueError(f"shape mismatch at {path}: "
                                 f"{q.shape} vs {np.asarray(leaf).shape}")
            out[path] = q
            out[path[:-1] + (path[-1] + "_scale",)] = scale
        elif path[-1].endswith("_scale") and path not in flat_f32:
            continue  # computed alongside its table above
        else:
            src = np.asarray(flat_f32[path])
            if src.shape != np.asarray(leaf).shape:
                raise ValueError(f"shape mismatch at {path}: "
                                 f"{src.shape} vs {np.asarray(leaf).shape}")
            out[path] = src
    restored = flax.traverse_util.unflatten_dict(out)
    return flax.serialization.from_state_dict(q_template, restored)


_FUSED_TABLE_RE = None


def _is_fused_table(name):
    """Fused-table param names from ops/embedding.py EmbeddingLayout:
    ``table_d{dim}`` or ``table_d{dim}b{k}``. Pretrained per-field tables
    (``pretrain_{field}``) are NOT quantized — the pretrained lookup path
    reads them as float."""
    global _FUSED_TABLE_RE
    if _FUSED_TABLE_RE is None:
        import re
        _FUSED_TABLE_RE = re.compile(r"table_d\d+(b\d+)?")
    return bool(_FUSED_TABLE_RE.fullmatch(name))


def quantize_table_leaves(params):
    """Export-time quantization: replace every fused-table leaf in a float
    param tree with (int8 table, ``*_scale`` sibling). The result matches
    the param structure of a model built with ``table_dtype="int8"``, so
    the Predictor restores it directly."""
    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(params))
    out = {}
    for path, leaf in flat.items():
        if _is_fused_table(path[-1]):
            q, scale = quantize_row_int8(leaf)
            out[path] = q
            out[path[:-1] + (path[-1] + "_scale",)] = scale
        else:
            out[path] = np.asarray(leaf)
    return flax.traverse_util.unflatten_dict(out)


def table_bytes(params):
    """Total bytes of embedding-table leaves (fused ``table_*`` params),
    for before/after memory reporting."""
    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(params))
    total = 0
    for path, leaf in flat.items():
        if path[-1].startswith("table_"):
            arr = np.asarray(jax.device_get(leaf))
            total += arr.size * arr.dtype.itemsize
    return total
