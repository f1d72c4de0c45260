"""BASELINE.md tracked config: FM + LR on a Criteo-sample-scale dataset.

The sample is the leading slice of the full-scale synthetic Criteo raw csvs
(scripts/make_criteo_scale.py): train 4.58M / valid 1M / test 1M rows —
the same 10%-of-criteo_x1 scale as the public criteo sample workloads.
Because the planted true logits align row-by-row, the Bayes ceiling is
measurable on the exact eval rows here too.

Usage: python scripts/run_criteo_sample.py --phase build|train|all
"""

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FULL_RAW = os.environ.get("CRITEO_RAW", "/tmp/ctr_scale/criteo_full_raw")
RAW = os.environ.get("CRITEO_SAMPLE_RAW", "/tmp/ctr_scale/criteo_sample_raw")
DATA_ROOT = os.environ.get("CRITEO_SAMPLE_DATA",
                           "/tmp/ctr_scale/criteo_sample_data")
DATASET_ID = "criteo_sample_syn"
ROWS = {"train": 4_587_167, "valid": 1_000_000, "test": 1_000_000}

FEATURE_COLS = [
    {"name": [f"I{i}" for i in range(1, 14)], "active": True,
     "dtype": "float", "type": "numeric", "fill_na": 0.0},
    {"name": [f"C{i}" for i in range(1, 27)], "active": True,
     "dtype": "str", "type": "categorical", "min_categr_count": 2,
     "fill_na": ""},
]
LABEL_COL = {"name": "label", "dtype": "float"}

PARAMS = dict(
    dataset_id=DATASET_ID, data_root=DATA_ROOT + "/",
    model_root="/tmp/ctr_scale/checkpoints/", data_format="csv",
    train_data=f"{RAW}/train.csv", valid_data=f"{RAW}/valid.csv",
    test_data=f"{RAW}/test.csv",
    feature_cols=FEATURE_COLS, label_col=LABEL_COL,
    min_categr_count=2, data_block_size=2_000_000,
)


def phase_build():
    os.makedirs(RAW, exist_ok=True)
    for split, n in ROWS.items():
        src, dst = f"{FULL_RAW}/{split}.csv", f"{RAW}/{split}.csv"
        if not os.path.exists(dst):
            with open(src) as fi, open(dst, "w", buffering=1 << 22) as fo:
                for line in itertools.islice(fi, n + 1):   # +1 header
                    fo.write(line)
            logit = np.load(f"{FULL_RAW}/{split}_true_logit.npy")
            np.save(f"{RAW}/{split}_true_logit.npy", logit[:n])

    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset
    params = dict(PARAMS, model_id="build_sample")
    set_logger(params)
    t0 = time.time()
    fp = FeatureProcessor(**params)
    out = build_dataset(fp, **params)
    print(json.dumps({"phase": "build", "seconds": round(time.time() - t0, 1),
                      "parts": out}), flush=True)


def phase_train(model_name="FM", epochs=2, batch_size=8192,
                steps_per_call=10, compute_dtype="bfloat16"):
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.metrics import evaluate_metrics
    from fuxictr_tpu.models import get_model, seed_everything

    params = dict(PARAMS)
    params.update(
        model_id=f"{model_name}_{DATASET_ID}", model=model_name,
        batch_size=batch_size, shuffle=True, data_format="parquet",
        device_cache=True,
        train_data=f"{DATA_ROOT}/{DATASET_ID}/train/",
        valid_data=f"{DATA_ROOT}/{DATASET_ID}/valid/",
        test_data=f"{DATA_ROOT}/{DATASET_ID}/test/",
        embedding_dim=16, learning_rate=1e-3,
        embedding_regularizer=1e-6, net_regularizer=None,
        steps_per_call=steps_per_call, compute_dtype=compute_dtype,
        monitor="AUC", metrics=["AUC", "logloss"],
        reduce_lr_on_plateau=True, epochs=epochs, verbose=1)
    set_logger(params)
    seed_everything(2019)

    data_dir = os.path.join(params["data_root"], DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), params)
    model = get_model(model_name)(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()

    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=epochs)
    train_s = time.time() - t0
    print(json.dumps({
        "phase": "train", "model": model_name,
        "seconds": round(train_s, 1),
        "sustained_examples_per_s":
            round(train_gen.num_samples * epochs / train_s)}), flush=True)

    for split in ("valid", "test"):
        gen = RankDataLoader(
            fm, stage="test", batch_size=batch_size, data_format="parquet",
            test_data=f"{DATA_ROOT}/{DATASET_ID}/{split}/",
            device_cache=True, shuffle=False).make_iterator()
        logs = model.evaluate(gen)
        true_logit = np.load(f"{RAW}/{split}_true_logit.npy")
        y_true = gen.host_labels[:gen.num_samples, 0]
        bayes = evaluate_metrics(
            y_true, 1 / (1 + np.exp(-true_logit[:len(y_true)])),
            ["AUC", "logloss"])
        print(json.dumps({
            "phase": "eval", "split": split, "model": model_name,
            "AUC": round(float(logs["AUC"]), 6),
            "logloss": round(float(logs["logloss"]), 6),
            "bayes_AUC": round(float(bayes["AUC"]), 6),
            "AUC_gap_to_bayes": round(float(bayes["AUC"] - logs["AUC"]), 6),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["build", "train", "all"])
    ap.add_argument("--models", default="FM,LR")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()
    if args.phase in ("build", "all"):
        phase_build()
    if args.phase in ("train", "all"):
        for m in args.models.split(","):
            phase_train(m, epochs=args.epochs)
