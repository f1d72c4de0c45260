"""Wire-compression headroom for the device-cache staging path
(VERDICT r4 #8).

The e2e bench is tunnel-wire-bound (BENCHMARKS.md "e2e decomposition"):
after narrow staging (u8/u16/i32 column groups) and opt-in f16 floats,
~2.4 GB still crosses the 10-15 MB/s tunnel. This script measures, on the
ACTUAL staged bytes of the 45.8M-row Criteo benchmark:

  1. what the narrow plan ships today (bytes/row per group),
  2. how much entropy coding (zstd levels 1/3/9, with/without a
     byte-transpose filter) could still remove,
  3. host compress/decompress throughput — whether a transport that
     compressed the stream could keep up with the tunnel,
  4. the residual headroom of JIT-DECODABLE schemes (sub-byte bit-packing
     of tiny-vocab columns) — the only family the application layer can
     decode on device.

The decode side of zstd cannot run in XLA, so (2)+(3) quantify what a
TRANSPORT-layer feature would buy, not something the library can ship by
itself; (4) is what the library could do. Verdict lands in BENCHMARKS.md.

Usage: python scripts/bench_wire_compression.py [--rows 4000000]
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get("CRITEO_DATA", "/tmp/ctr_scale/criteo_full_data")
DSID = os.environ.get("CRITEO_DATASET_ID", "criteo_full_syn")


def staged_blocks(rows):
    """Reproduce the device-cache narrow staging exactly
    (fuxictr_tpu/data/device_cache.py:_plan_narrow/_put_int_block)."""
    from fuxictr_tpu.data.device_cache import cache_layout
    from fuxictr_tpu.features import FeatureMap

    data_dir = os.path.join(DATA, DSID)
    fm = FeatureMap(DSID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), {})
    layout, wi, wf = cache_layout(fm)

    import pyarrow.parquet as pq
    parts = sorted(glob.glob(os.path.join(data_dir, "train", "*.parquet")))
    bi = np.zeros((rows, wi), np.int32)
    bf = np.zeros((rows, wf), np.float32)
    got = 0
    for p in parts:
        t = pq.read_table(p)
        n = min(len(t), rows - got)
        for name, (blk, lo, w, kind) in layout.items():
            if name not in t.column_names:
                continue
            v = t[name].to_numpy()[:n]
            tgt = bi if blk == "int" else bf
            tgt[got:got + n, lo:lo + w] = np.asarray(v).reshape(n, w)
        got += n
        if got >= rows:
            break
    bi, bf = bi[:got], bf[:got]

    lo = bi.min(axis=0)
    hi = bi.max(axis=0)
    groups = {"u8": [], "u16": [], "i32": []}
    for c in range(bi.shape[1]):
        if lo[c] >= 0 and hi[c] <= np.iinfo(np.uint8).max:
            groups["u8"].append(c)
        elif lo[c] >= 0 and hi[c] <= np.iinfo(np.uint16).max:
            groups["u16"].append(c)
        else:
            groups["i32"].append(c)
    narrow = {}
    for dt, cols in (("uint8", groups["u8"]), ("uint16", groups["u16"]),
                     ("int32", groups["i32"])):
        if cols:
            narrow[dt] = np.ascontiguousarray(bi[:, cols].astype(dt))
    narrow["float16"] = bf.astype(np.float16)   # bench default staging
    return narrow, bi, got


def measure(buf, level, transpose):
    import zstandard as zstd

    raw = buf.tobytes()
    if transpose:
        # byte-plane transpose: group the k-th byte of every element
        # together — multibyte dtypes compress far better this way
        a = np.frombuffer(raw, np.uint8).reshape(-1, buf.dtype.itemsize)
        raw = np.ascontiguousarray(a.T).tobytes()
    c = zstd.ZstdCompressor(level=level)
    t0 = time.time()
    comp = c.compress(raw)
    t_c = time.time() - t0
    d = zstd.ZstdDecompressor()
    t0 = time.time()
    out = d.decompress(comp)
    t_d = time.time() - t0
    assert len(out) == len(raw)
    return {"ratio": round(len(raw) / len(comp), 2),
            "compress_MBps": round(len(raw) / 2**20 / max(t_c, 1e-9)),
            "decompress_MBps": round(len(raw) / 2**20 / max(t_d, 1e-9))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    args = ap.parse_args()

    narrow, bi, rows = staged_blocks(args.rows)
    report = {"rows": rows}
    total_today = 0
    for dt, arr in narrow.items():
        total_today += arr.nbytes
        entry = {"bytes_per_row": round(arr.nbytes / rows, 2)}
        for level in (1, 3, 9):
            entry[f"zstd{level}"] = measure(arr, level, transpose=False)
        if arr.dtype.itemsize > 1:
            entry["zstd3_transposed"] = measure(arr, 3, transpose=True)
        report[dt] = entry
        print(json.dumps({dt: entry}), flush=True)

    # JIT-decodable residual: pack u8 columns whose vocab fits 4 bits
    lo = bi.min(axis=0)
    hi = bi.max(axis=0)
    nibble_cols = int(np.sum((lo >= 0) & (hi <= 15)))
    u8_cols = int(np.sum((lo >= 0) & (hi <= 255)))
    report["jit_decodable_packing"] = {
        "u8_cols": u8_cols, "nibble_cols": nibble_cols,
        "bytes_saved_per_row": round(nibble_cols * 0.5, 2),
        "pct_of_today": round(nibble_cols * 0.5 / (total_today / rows) * 100,
                              2)}
    report["today_bytes_per_row"] = round(total_today / rows, 2)
    best = sum(
        arr.nbytes / report[dt]["zstd3_transposed" if "zstd3_transposed"
                                in report[dt] else "zstd3"]["ratio"]
        for dt, arr in narrow.items())
    report["transport_zstd3_bytes_per_row"] = round(best / rows, 2)
    report["transport_speedup"] = round(total_today / best, 2)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
