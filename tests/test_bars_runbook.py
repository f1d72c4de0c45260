"""Egress-day BARS runbook (scripts/run_bars_criteo.py): the pipeline must
parse the REAL raw Criteo display-challenge dialect — headerless,
TAB-separated, 13 integer columns with empties, 26 hex categoricals with
empties — not just the synthetic generator's headered csv output.
Reference dialect assumption being closed:
/root/reference/fuxictr/datasets/criteo.py:27-45 (BARS csv form)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pandas as pd
import pytest


def _runbook():
    spec = importlib.util.spec_from_file_location(
        "run_bars_criteo",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "run_bars_criteo.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_raw_tsv(path, n=400, seed=0):
    """Synthetic file in the exact raw Criteo train.txt dialect."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as fd:
        for _ in range(n):
            label = str(rng.integers(0, 2))
            ints = [("" if rng.random() < 0.3          # missing ints
                     else str(int(rng.integers(-2, 1000))))
                    for _ in range(13)]
            cats = [("" if rng.random() < 0.2          # missing cats
                     else format(rng.integers(0, 1 << 32), "08x"))
                    for _ in range(26)]
            fd.write("\t".join([label] + ints + cats) + "\n")


def test_convert_parses_raw_tsv_dialect(tmp_path):
    rb = _runbook()
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_raw_tsv(str(raw / "train.txt"), n=400)
    rb.phase_convert(str(raw), str(tmp_path / "x1"), split_seed=7,
                     rows_per_part=150)     # force multiple chunks

    total = 0
    for split in ("train", "valid", "test"):
        parts = sorted((tmp_path / "x1" / split).glob("*.csv"))
        assert parts, f"no parts for {split}"
        df = pd.concat([pd.read_csv(p, dtype={f"C{i}": "object"
                                              for i in range(1, 27)})
                        for p in parts])
        # headered BARS csv form with all 40 columns
        assert list(df.columns) == rb.RAW_COLS
        # hex categoricals survive as strings (not mangled to floats)
        c1 = df["C1"].dropna()
        assert all(isinstance(v, str) and len(v) == 8 for v in c1)
        total += len(df)
    assert total == 400                      # no rows lost or duplicated


def test_convert_is_deterministic(tmp_path):
    rb = _runbook()
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_raw_tsv(str(raw / "train.txt"), n=200)
    for d in ("a", "b"):
        rb.phase_convert(str(raw), str(tmp_path / d), split_seed=11)
    for split in ("train", "valid", "test"):
        a = pd.concat([pd.read_csv(p) for p in
                       sorted((tmp_path / "a" / split).glob("*.csv"))])
        b = pd.concat([pd.read_csv(p) for p in
                       sorted((tmp_path / "b" / split).glob("*.csv"))])
        pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                      b.reset_index(drop=True))


def test_build_and_train_smoke_from_raw(tmp_path):
    """convert -> build -> one-epoch train on a tiny raw TSV: the full
    egress-day path end-to-end (log2-bucketed numerics, hex vocab fit,
    parquet parts, DCNv2 recipe shape)."""
    rb = _runbook()
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_raw_tsv(str(raw / "train.txt"), n=600, seed=3)
    out = str(tmp_path / "x1")
    rb.phase_convert(str(raw), out, split_seed=7)
    rb.phase_build(out)
    fm_json = os.path.join(out, "criteo_x1", "feature_map.json")
    assert os.path.exists(fm_json)
    with open(fm_json) as fd:
        fm = json.load(fd)
    # numeric I* became log2-bucketed categoricals with fitted vocabs
    assert fm["features"]
    i1 = next(v for f in fm["features"] for k, v in f.items() if k == "I1")
    assert i1["type"] == "categorical" and i1["vocab_size"] > 1

    # train one epoch with the recipe (shrunk net for test speed)
    rb.BARS_DCNV2_CRITEO_X1.update(
        embedding_dim=4, batch_size=64,
        stacked_dnn_hidden_units=[8], parallel_dnn_hidden_units=[8],
        num_cross_layers=1, epochs=1)
    rb.phase_train(out, epochs=1, model_root=str(tmp_path / "ckpt"))
