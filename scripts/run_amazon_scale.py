"""Amazon-Electronics-scale DIN benchmark: offline build + on-chip training
with AUC vs the planted Bayes ceiling (BASELINE.md tracked config
DIN/Amazon; data from scripts/make_amazon_scale.py).

Usage: python scripts/run_amazon_scale.py --phase build|train|all
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW = os.environ.get("AMAZON_RAW", "/tmp/ctr_scale/amazon_raw")
DATA_ROOT = os.environ.get("AMAZON_DATA", "/tmp/ctr_scale/amazon_data")
DATASET_ID = os.environ.get("AMAZON_DATASET_ID", "amazon_syn")
MAX_LEN = 100

FEATURE_COLS = [
    {"name": "user_id", "active": True, "dtype": "str",
     "type": "categorical"},
    {"name": "item_id", "active": True, "dtype": "str",
     "type": "categorical"},
    {"name": "cate_id", "active": True, "dtype": "str",
     "type": "categorical"},
    {"name": "item_history", "active": True, "dtype": "str",
     "type": "sequence", "splitter": "^", "max_len": MAX_LEN,
     "share_embedding": "item_id", "feature_encoder": None},
    {"name": "cate_history", "active": True, "dtype": "str",
     "type": "sequence", "splitter": "^", "max_len": MAX_LEN,
     "share_embedding": "cate_id", "feature_encoder": None},
]
LABEL_COL = {"name": "label", "dtype": "float"}

PARAMS = dict(
    model_id="DIN_amazon", dataset_id=DATASET_ID,
    data_root=DATA_ROOT + "/", model_root="/tmp/ctr_scale/checkpoints/",
    data_format="csv",
    train_data=f"{RAW}/train.csv", valid_data=f"{RAW}/valid.csv",
    test_data=f"{RAW}/test.csv",
    feature_cols=FEATURE_COLS, label_col=LABEL_COL,
    min_categr_count=1, data_block_size=1_000_000,
)


def phase_build():
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset
    set_logger(PARAMS)
    t0 = time.time()
    fp = FeatureProcessor(**PARAMS)
    out = build_dataset(fp, **PARAMS)
    print(json.dumps({"phase": "build", "seconds": round(time.time() - t0, 1),
                      "parts": out}), flush=True)


def phase_train(epochs=1, batch_size=2048, steps_per_call=None,
                compute_dtype="bfloat16", loader="device"):
    if steps_per_call is None:
        steps_per_call = 32 if loader == "device" else 8
    import numpy as np

    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.metrics import evaluate_metrics
    from fuxictr_tpu.models import get_model, seed_everything

    params = dict(PARAMS)
    params.update(
        model="DIN", batch_size=batch_size, shuffle=True,
        streaming=loader == "streaming",
        device_cache=loader == "device", data_format="parquet",
        train_data=f"{DATA_ROOT}/{DATASET_ID}/train/",
        valid_data=f"{DATA_ROOT}/{DATASET_ID}/valid/",
        test_data=f"{DATA_ROOT}/{DATASET_ID}/test/",
        embedding_dim=32, learning_rate=1e-3,
        dnn_hidden_units=[512, 256, 128], attention_hidden_units=[64],
        din_target_field=("item_id", "cate_id"),
        din_sequence_field=("item_history", "cate_history"),
        net_dropout=0.1, steps_per_call=steps_per_call,
        compute_dtype=compute_dtype, monitor="AUC",
        metrics=["AUC", "logloss"], epochs=epochs, verbose=1)
    set_logger(params)
    seed_everything(2019)

    data_dir = os.path.join(params["data_root"], DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), params)
    print(f"total_features={fm.total_features}", flush=True)

    model = get_model("DIN")(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()
    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=epochs)
    train_s = time.time() - t0
    rates = getattr(model, "_window_rates", [])
    print(json.dumps({"phase": "train", "model": "DIN",
                      "seconds": round(train_s, 1),
                      "sustained_examples_per_s":
                          round(train_gen.num_samples * epochs / train_s),
                      "steady_examples_per_s":
                          round(rates[-1]) if len(rates) >= 2 else None}),
          flush=True)

    for split in ("valid", "test"):
        if split == "valid":
            gen = valid_gen     # reuse the already-staged loader
        else:
            gen = RankDataLoader(
                fm, stage="test",
                test_data=f"{DATA_ROOT}/{DATASET_ID}/{split}/",
                batch_size=batch_size, data_format="parquet",
                streaming=loader == "streaming",
                device_cache=loader == "device",
                shuffle=False).make_iterator()
        logs = model.evaluate(gen)
        import glob

        import pyarrow.parquet as pq
        true_logit = np.load(f"{RAW}/{split}_true_logit.npy")
        y_true = np.concatenate([
            pq.read_table(p, columns=["label"])["label"].to_numpy()
            for p in sorted(glob.glob(
                f"{DATA_ROOT}/{DATASET_ID}/{split}/*.parquet"))])
        bayes = evaluate_metrics(
            y_true[:len(true_logit)],
            1 / (1 + np.exp(-true_logit[:len(y_true)])), ["AUC", "logloss"])
        print(json.dumps({
            "phase": "eval", "split": split, "model": "DIN",
            "AUC": round(float(logs["AUC"]), 6),
            "logloss": round(float(logs["logloss"]), 6),
            "bayes_AUC": round(float(bayes["AUC"]), 6),
            "AUC_gap_to_bayes": round(float(bayes["AUC"] - logs["AUC"]), 6),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["build", "train", "all"])
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--loader", default="device",
                    choices=["streaming", "memory", "device"])
    args = ap.parse_args()
    if args.phase in ("build", "all"):
        phase_build()
    if args.phase in ("train", "all"):
        phase_train(epochs=args.epochs, batch_size=args.batch_size,
                    loader=args.loader)
