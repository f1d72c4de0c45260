"""Egress-day BARS runbook: raw Criteo files -> criteo_x1 split -> DCNv2
train -> AUC, in one command.

The reference delegates real-data benchmarking to the BARS project
(/root/reference/README.md:99-105: datasets, settings, leaderboard). This
environment has zero egress, so the raw files cannot be fetched here — but
the moment they can, parity with the published BARS numbers should be one
command, not a porting project:

    python scripts/run_bars_criteo.py --raw /path/to/criteo --phase all

Phases:
  convert  raw Criteo *display-challenge* dialect (``train.txt``:
           HEADERLESS, TAB-separated, 40 cols = label + 13 integer I* +
           26 hex-string C*, empties for missing) -> headered csv parts +
           the criteo_x1 8:1:1 random split
           (/root/reference/fuxictr/datasets/criteo.py:27-45 assumes the
           BARS csv form; this phase produces exactly that form)
  build    FeatureProcessor fit/transform with the BARS criteo_x1
           feature_cols (numeric I* log2-bucketed to categorical via the
           criteo customizer) -> parquet parts + feature_map.json
  train    DCNv2 with the BARS DCNv2_criteo_x1 recipe hyperparameters

VERIFY ON EGRESS DAY — two knobs were transcribed from the BARS repo and
must be checked against it once reachable
(https://github.com/reczoo/BARS/tree/main/ranking/ctr/DCNv2/DCNv2_criteo_x1):
  1. the criteo_x1 split seed/protocol (AFN-paper random 8:1:1 is encoded;
     --split-seed overrides)
  2. the DCNv2 hyperparameters in BARS_DCNV2_CRITEO_X1 below
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW_COLS = (["label"] + [f"I{i}" for i in range(1, 14)]
            + [f"C{i}" for i in range(1, 27)])

# BARS criteo_x1 feature spec: numeric I* are log2-bucketed into
# categoricals (fuxictr_tpu/datasets/criteo.py convert_to_bucket), C* are
# hex categoricals; min_categr_count per the BARS config.
FEATURE_COLS = [
    {"name": [f"I{i}" for i in range(1, 14)], "active": True,
     "dtype": "float", "type": "categorical",
     "preprocess": "convert_to_bucket", "fill_na": 0},
    {"name": [f"C{i}" for i in range(1, 27)], "active": True,
     "dtype": "str", "type": "categorical", "fill_na": ""},
]
LABEL_COL = {"name": "label", "dtype": "float"}

# transcribed DCNv2_criteo_x1 recipe (VERIFY ON EGRESS DAY, see module doc)
BARS_DCNV2_CRITEO_X1 = dict(
    model="DCNv2", embedding_dim=10, batch_size=4096,
    model_structure="parallel",
    stacked_dnn_hidden_units=[500, 500, 500],
    parallel_dnn_hidden_units=[500, 500, 500],
    num_cross_layers=3, net_dropout=0.1,
    learning_rate=1e-3, embedding_regularizer=1e-5, net_regularizer=0,
    optimizer="adam", loss="binary_crossentropy",
    monitor="AUC", monitor_mode="max", early_stop_patience=2,
    reduce_lr_on_plateau=True, epochs=10, min_categr_count=1,
)


def phase_convert(raw_dir, out_dir, split_seed=2021, rows_per_part=4_000_000):
    """Raw display-challenge ``train.txt`` -> criteo_x1 csv split.

    Streams the TSV in chunks (the file is ~11 GB); assigns each row a
    split by a seeded hash-free random draw so the 8:1:1 proportions hold
    without materializing a 45.8M-element permutation per chunk pass.
    """
    import numpy as np
    import pandas as pd

    src = os.path.join(raw_dir, "train.txt")
    if not os.path.exists(src):
        # also accept a pre-headered csv (already converted elsewhere)
        alt = os.path.join(raw_dir, "train.csv")
        if os.path.exists(alt):
            src = alt
        else:
            raise FileNotFoundError(f"neither train.txt nor train.csv in "
                                    f"{raw_dir}")
    raw_dialect = src.endswith(".txt")
    os.makedirs(out_dir, exist_ok=True)
    writers = {}
    counts = {"train": 0, "valid": 0, "test": 0}
    rng = np.random.default_rng(split_seed)
    reader = pd.read_csv(
        src, sep="\t" if raw_dialect else ",",
        header=None if raw_dialect else 0,
        names=RAW_COLS if raw_dialect else None,
        dtype={c: ("float64" if c == "label" or c.startswith("I")
                   else "object") for c in RAW_COLS},
        chunksize=rows_per_part)
    t0 = time.time()
    for chunk in reader:
        # criteo_x1 protocol: random 8:1:1 (AFN paper); rows are assigned
        # independently — at 45.8M rows the realized proportions are
        # within ±0.02% of exact
        draw = rng.random(len(chunk))
        split = np.where(draw < 0.8, "train",
                         np.where(draw < 0.9, "valid", "test"))
        for name in ("train", "valid", "test"):
            part = chunk[split == name]
            if not len(part):
                continue
            sub = os.path.join(out_dir, name)
            os.makedirs(sub, exist_ok=True)
            idx = writers.get(name, 0)
            part.to_csv(os.path.join(sub, f"part_{idx:04d}.csv"),
                        index=False)
            writers[name] = idx + 1
            counts[name] += len(part)
    print(json.dumps({"phase": "convert", "seconds": round(time.time() - t0, 1),
                      **counts}), flush=True)


def phase_build(out_dir, dataset_id="criteo_x1"):
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.datasets.criteo import CustomizedFeatureProcessor
    from fuxictr_tpu.preprocess import build_dataset

    params = dict(
        dataset_id=dataset_id, data_root=out_dir + "/",
        data_format="csv",
        train_data=os.path.join(out_dir, "train"),
        valid_data=os.path.join(out_dir, "valid"),
        test_data=os.path.join(out_dir, "test"),
        feature_cols=FEATURE_COLS, label_col=LABEL_COL,
        min_categr_count=BARS_DCNV2_CRITEO_X1["min_categr_count"],
        data_block_size=4_000_000)
    set_logger(params)
    t0 = time.time()
    fp = CustomizedFeatureProcessor(**params)
    train, valid, test = build_dataset(fp, **params)
    print(json.dumps({"phase": "build",
                      "seconds": round(time.time() - t0, 1),
                      "train": train, "valid": valid, "test": test}),
          flush=True)


def phase_train(out_dir, dataset_id="criteo_x1", epochs=None,
                model_root="./checkpoints/"):
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models import get_model

    params = dict(BARS_DCNV2_CRITEO_X1)
    params.update(
        model_id=f"DCNv2_{dataset_id}", dataset_id=dataset_id,
        data_root=out_dir + "/", model_root=model_root,
        data_format="parquet", shuffle=True, device_cache=True,
        steps_per_call=32, compute_dtype="bfloat16", rng_impl="rbg",
        metrics=["AUC", "logloss"],
        train_data=os.path.join(out_dir, dataset_id, "train"),
        valid_data=os.path.join(out_dir, dataset_id, "valid"),
        test_data=os.path.join(out_dir, dataset_id, "test"))
    if epochs:
        params["epochs"] = epochs
    set_logger(params)
    data_dir = os.path.join(out_dir, dataset_id)
    fm = FeatureMap(dataset_id, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), params)
    model = get_model(params["model"])(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()
    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen,
              epochs=params["epochs"])
    train_s = time.time() - t0
    test_gen = RankDataLoader(
        fm, stage="test", test_data=params["test_data"],
        batch_size=params["batch_size"], data_format="parquet",
        device_cache=True, shuffle=False).make_iterator()
    logs = model.evaluate(test_gen)
    print(json.dumps({
        "phase": "train", "seconds": round(train_s, 1),
        "test_AUC": round(float(logs["AUC"]), 6),
        "test_logloss": round(float(logs["logloss"]), 6),
        "bars_reference_AUC": 0.8138,   # published DCNv2 criteo_x1 board
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", default="/tmp/criteo_raw",
                    help="dir containing the raw train.txt (or train.csv)")
    ap.add_argument("--out", default="/tmp/criteo_x1",
                    help="working dir for split csvs + built parquet")
    ap.add_argument("--phase", default="all",
                    choices=["convert", "build", "train", "all"])
    ap.add_argument("--split-seed", type=int, default=2021)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    if args.phase in ("convert", "all"):
        phase_convert(args.raw, args.out, split_seed=args.split_seed)
    if args.phase in ("build", "all"):
        phase_build(args.out)
    if args.phase in ("train", "all"):
        phase_train(args.out, epochs=args.epochs)
