"""Native host-runtime kernels (C, loaded via ctypes) with pure-NumPy
fallbacks. Build with ``python -m fuxictr_tpu.native.build`` (or let the
first import compile it on the fly; gcc is required)."""

import ctypes
import logging
import os

import numpy as np

_LIB = None
_SO_PATH = os.path.join(os.path.dirname(__file__), "_fastops.so")


def _ensure_built():
    global _LIB
    if _LIB is not None:
        return _LIB
    src = os.path.join(os.path.dirname(__file__), "_fastops.c")
    if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH) < os.path.getmtime(src)):
        import subprocess
        try:
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, src],
                check=True, capture_output=True)
        except Exception as exc:  # no compiler → numpy fallback
            logging.debug("native build failed (%s); using numpy fallback",
                          exc)
            _LIB = False
            return _LIB
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.pad_sequences_i64.restype = None
        lib.take_rows_i64.restype = None
        lib.take_rows_f32.restype = None
        lib.unique_inverse_i64.restype = ctypes.c_int64
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def _ptr(a, typ):
    return a.ctypes.data_as(ctypes.POINTER(typ))


def pad_sequences(seqs, lens, max_len, pre_pad=True):
    """Variable-length sequences → [n, max_len] int64 (pre/post pad+trunc).

    ``seqs``: sequence of 1-D int arrays; ``lens[i]``: how many leading
    elements of seqs[i] are valid (the LongCTR ``seq_len`` column).
    """
    n = len(seqs)
    out = np.zeros((n, max_len), np.int64)
    lib = _ensure_built()
    if lib:
        arrays = [np.ascontiguousarray(s, np.int64) for s in seqs]
        data = np.concatenate(arrays) if arrays else np.zeros(0, np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum([len(a) for a in arrays], out=offsets[1:])
        lens = np.ascontiguousarray(lens, np.int64)
        lib.pad_sequences_i64(
            _ptr(data, ctypes.c_int64), _ptr(offsets, ctypes.c_int64),
            _ptr(lens, ctypes.c_int64), ctypes.c_int64(n),
            ctypes.c_int64(max_len), ctypes.c_int(int(pre_pad)),
            _ptr(out, ctypes.c_int64))
        return out
    for i, (s, l) in enumerate(zip(seqs, lens)):          # numpy fallback
        s = np.asarray(s, np.int64)[:int(l)]
        # keras pad_sequences semantics: truncating side follows padding side
        s = s[-max_len:] if pre_pad else s[:max_len]
        if pre_pad:
            out[i, max_len - len(s):] = s
        else:
            out[i, :len(s)] = s
    return out


def take_rows(table, ids):
    """Row gather from a contiguous 2-D host table (int64 or float32)."""
    table = np.ascontiguousarray(table)
    ids = np.ascontiguousarray(ids, np.int64)
    lib = _ensure_built()
    if not lib or table.ndim != 2 or table.dtype not in (np.int64,
                                                         np.float32):
        return table[ids]
    out = np.empty((len(ids), table.shape[1]), table.dtype)
    if table.dtype == np.int64:
        lib.take_rows_i64(_ptr(table, ctypes.c_int64),
                          _ptr(ids, ctypes.c_int64),
                          ctypes.c_int64(len(ids)),
                          ctypes.c_int64(table.shape[1]),
                          _ptr(out, ctypes.c_int64))
    else:
        lib.take_rows_f32(_ptr(table, ctypes.c_float),
                          _ptr(ids, ctypes.c_int64),
                          ctypes.c_int64(len(ids)),
                          ctypes.c_int64(table.shape[1]),
                          _ptr(out, ctypes.c_float))
    return out


def unique_inverse(ids):
    """(uniq, inv) such that uniq[inv] == ids, uniq in first-occurrence
    order — a linear-pass hash dedup (np.unique sorts, ~5-10x slower on
    the LongCTR collate path). Falls back to np.unique."""
    ids = np.ascontiguousarray(ids, np.int64)
    lib = _ensure_built()
    if not lib:
        uniq, inv = np.unique(ids, return_inverse=True)
        return uniq, inv.astype(np.int32)
    n = len(ids)
    ht_size = 1
    while ht_size < 2 * max(n, 1):
        ht_size *= 2
    ht_keys = np.full(ht_size, -1, np.int64)
    ht_vals = np.empty(ht_size, np.int32)
    uniq = np.empty(n, np.int64)
    inv = np.empty(n, np.int32)
    count = lib.unique_inverse_i64(
        _ptr(ids, ctypes.c_int64), ctypes.c_int64(n),
        _ptr(uniq, ctypes.c_int64), _ptr(inv, ctypes.c_int32),
        _ptr(ht_keys, ctypes.c_int64), _ptr(ht_vals, ctypes.c_int32),
        ctypes.c_int64(ht_size))
    return uniq[:count], inv
