"""Avazu-scale benchmark: offline build THROUGH the customized
FeatureProcessor (derived weekday/weekend/hour-of-day) + on-chip training,
with AUC measured against the planted Bayes ceiling.

Completes the BASELINE.md north-star trio (Criteo / Avazu / Amazon).
Dataset: scripts/make_avazu_scale.py — 40.43M rows, Avazu schema, planted
ground-truth whose time effects are carried ONLY by the YYMMDDHH ``hour``
column. The benchmark therefore exercises the reference-parity avazu
customizer end to end (fuxictr_tpu/datasets/avazu.py, cf.
/root/reference/fuxictr/datasets/avazu.py:26-70): weekday / weekend /
hour-of-day must be DERIVED for a model to approach the ceiling.

``--variant raw_hour`` builds a control WITHOUT the customizer: the raw
YYMMDDHH hour is tokenized as an opaque categorical, so the test split's
hours (later days) are all OOV and the diurnal/weekend signal is lost —
quantifying what the customizer path is worth.

Usage: python scripts/run_avazu_scale.py --phase all [--model DeepFM]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW = os.environ.get("AVAZU_RAW", "/tmp/ctr_scale/avazu_raw")
DATA_ROOT = os.environ.get("AVAZU_DATA", "/tmp/ctr_scale/avazu_data")

RAW_CAT_NAMES = [
    "C1", "banner_pos", "site_id", "site_domain", "site_category",
    "app_id", "app_domain", "app_category", "device_id", "device_ip",
    "device_model", "device_type", "device_conn_type",
    "C14", "C15", "C16", "C17", "C18", "C19", "C20", "C21",
]
LABEL_COL = {"name": "click", "dtype": "float"}


def feature_cols(variant):
    cols = [{"name": RAW_CAT_NAMES, "active": True, "dtype": "int",
             "type": "categorical", "min_categr_count": 2}]
    if variant == "custom":
        # BARS avazu_x1 shape: hour -> hour-of-day; derived weekday/weekend
        cols += [
            {"name": "hour", "active": True, "dtype": "str",
             "type": "categorical", "preprocess": "convert_hour"},
            {"name": "weekday", "active": True, "dtype": "int",
             "type": "categorical", "preprocess": "convert_weekday"},
            {"name": "weekend", "active": True, "dtype": "int",
             "type": "categorical", "preprocess": "convert_weekend"},
        ]
    else:                       # raw_hour control: opaque YYMMDDHH tokens
        cols += [{"name": "hour", "active": True, "dtype": "str",
                  "type": "categorical"}]
    return cols


def base_params(variant):
    dataset_id = f"avazu_syn_{variant}"
    return dict(
        dataset_id=dataset_id, data_root=DATA_ROOT + "/",
        model_root="/tmp/ctr_scale/checkpoints/", data_format="csv",
        train_data=f"{RAW}/train.csv", valid_data=f"{RAW}/valid.csv",
        test_data=f"{RAW}/test.csv",
        feature_cols=feature_cols(variant), label_col=LABEL_COL,
        min_categr_count=2, data_block_size=4_000_000,
    )


def phase_build(variant):
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.datasets.avazu import CustomizedFeatureProcessor
    from fuxictr_tpu.preprocess import build_dataset
    params = dict(base_params(variant), model_id=f"build_{variant}")
    set_logger(params)
    t0 = time.time()
    fp = CustomizedFeatureProcessor(**params)
    train, valid, test = build_dataset(fp, **params)
    print(json.dumps({"phase": "build", "variant": variant,
                      "seconds": round(time.time() - t0, 1),
                      "train": train, "valid": valid, "test": test}),
          flush=True)


def phase_train(variant, model_name="DeepFM", epochs=2, batch_size=8192,
                embedding_dim=16):
    import numpy as np

    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.metrics import evaluate_metrics
    from fuxictr_tpu.models import get_model, seed_everything

    params = base_params(variant)
    dataset_id = params["dataset_id"]
    params.update(
        model_id=f"{model_name}_{dataset_id}", model=model_name,
        batch_size=batch_size, shuffle=True, device_cache=True,
        data_format="parquet",
        train_data=f"{DATA_ROOT}/{dataset_id}/train/",
        valid_data=f"{DATA_ROOT}/{dataset_id}/valid/",
        test_data=f"{DATA_ROOT}/{dataset_id}/test/",
        embedding_dim=embedding_dim,
        # sqrt-scaled vs the B=8192 recipe (round-4 ladder)
        learning_rate=1e-3 * (batch_size / 8192) ** 0.5,
        net_regularizer=None, embedding_regularizer=None,
        steps_per_call=32, compute_dtype="bfloat16",
        monitor="AUC", metrics=["AUC", "logloss"],
        reduce_lr_on_plateau=True, epochs=epochs, verbose=1)
    if model_name == "DeepFM":
        params.update(hidden_units=[400, 400, 400], net_dropout=0.1)
    elif model_name == "DCNv2":
        params.update(model_structure="parallel",
                      stacked_dnn_hidden_units=[1024, 512, 256],
                      parallel_dnn_hidden_units=[1024, 512, 256],
                      num_cross_layers=4, net_dropout=0.1)
    elif model_name == "FinalMLP":
        params.update(mlp1_hidden_units=[400, 400, 400],
                      mlp2_hidden_units=[800], net_dropout=0.1,
                      use_fs=True, num_heads=2)
    set_logger(params)
    seed_everything(2019)

    data_dir = os.path.join(params["data_root"], dataset_id)
    fm = FeatureMap(dataset_id, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), params)
    print(f"total_features={fm.total_features} fields={fm.num_fields}",
          flush=True)

    model = get_model(model_name)(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()

    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=epochs)
    train_s = time.time() - t0
    print(json.dumps({"phase": "train", "variant": variant,
                      "model": model_name, "seconds": round(train_s, 1),
                      "examples_per_s_incl_compile":
                          round(train_gen.num_samples * epochs / train_s)}),
          flush=True)

    import glob

    import pyarrow.parquet as pq
    for split in ("valid", "test"):
        if split == "valid":
            gen = valid_gen
        else:
            gen = RankDataLoader(
                fm, stage="test",
                test_data=f"{DATA_ROOT}/{dataset_id}/{split}/",
                batch_size=batch_size, data_format="parquet",
                device_cache=True, shuffle=False).make_iterator()
        logs = model.evaluate(gen)
        true_logit = np.load(f"{RAW}/{split}_true_logit.npy")
        y_true = np.concatenate([
            pq.read_table(p, columns=["click"])["click"].to_numpy()
            for p in sorted(glob.glob(
                f"{DATA_ROOT}/{dataset_id}/{split}/*.parquet"))])
        bayes = evaluate_metrics(
            y_true[:len(true_logit)],
            1 / (1 + np.exp(-true_logit[:len(y_true)])), ["AUC", "logloss"])
        print(json.dumps({
            "phase": "eval", "variant": variant, "split": split,
            "model": model_name,
            "AUC": round(float(logs["AUC"]), 6),
            "logloss": round(float(logs["logloss"]), 6),
            "bayes_AUC": round(float(bayes["AUC"]), 6),
            "AUC_gap_to_bayes": round(float(bayes["AUC"] - logs["AUC"]), 6),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["build", "train", "all"])
    ap.add_argument("--variant", default="custom",
                    choices=["custom", "raw_hour"])
    ap.add_argument("--model", default="DeepFM")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--embedding-dim", type=int, default=16)
    args = ap.parse_args()
    if args.phase in ("build", "all"):
        phase_build(args.variant)
    if args.phase in ("train", "all"):
        phase_train(args.variant, args.model, epochs=args.epochs,
                    batch_size=args.batch_size,
                    embedding_dim=args.embedding_dim)
