"""Dynamic-weight family benchmark: PPNet (user-gated MLP) vs plain DNN
on the planted segment-conditional dataset (scripts/make_dynamic_scale.py).

The label's pairwise terms flip sign by HIDDEN user segment; only
user_id is observable. PPNet routes through GateNU scaling conditioned
on the user-id embedding (the family's premise); the DNN control must
discover the 8 latent modes inside shared weights. ``--model DNN_nouser``
additionally drops user_id (no segment information at all — the floor).

Usage: python scripts/run_dynamic_scale.py --phase all --model PPNet
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW = os.environ.get("DYNAMIC_RAW", "/tmp/ctr_scale/dynamic_raw")
DATA_ROOT = os.environ.get("DYNAMIC_DATA", "/tmp/ctr_scale/dynamic_data")
DATASET_ID = "dynamic_syn"

FEATURE_COLS = [
    {"name": "user_id", "active": True, "dtype": "int",
     "type": "categorical", "min_categr_count": 1},
    {"name": [f"C{i+1}" for i in range(12)], "active": True, "dtype": "int",
     "type": "categorical", "min_categr_count": 2},
]
LABEL_COL = {"name": "label", "dtype": "float"}


def base_params():
    return dict(
        dataset_id=DATASET_ID, data_root=DATA_ROOT + "/",
        model_root="/tmp/ctr_scale/checkpoints/", data_format="csv",
        train_data=f"{RAW}/train.csv", valid_data=f"{RAW}/valid.csv",
        test_data=f"{RAW}/test.csv",
        feature_cols=FEATURE_COLS, label_col=LABEL_COL,
        min_categr_count=1, data_block_size=4_000_000)


def phase_build():
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset
    params = dict(base_params(), model_id="build_dynamic")
    set_logger(params)
    t0 = time.time()
    fp = FeatureProcessor(**params)
    train, valid, test = build_dataset(fp, **params)
    print(json.dumps({"phase": "build",
                      "seconds": round(time.time() - t0, 1),
                      "train": train, "valid": valid, "test": test}),
          flush=True)


def phase_train(model_name="PPNet", epochs=2, batch_size=8192,
                learning_rate=None):
    if learning_rate is None:
        # sqrt-scaling vs the B=8192 recipe lr 1e-3
        learning_rate = 1e-3 * (batch_size / 8192) ** 0.5
    import numpy as np

    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.metrics import evaluate_metrics
    from fuxictr_tpu.models import get_model, seed_everything

    params = base_params()
    real_model = model_name.replace("_nouser", "")
    params.update(
        model_id=f"{model_name}_{DATASET_ID}", model=real_model,
        batch_size=batch_size, shuffle=True, device_cache=True,
        data_format="parquet",
        train_data=f"{DATA_ROOT}/{DATASET_ID}/train/",
        valid_data=f"{DATA_ROOT}/{DATASET_ID}/valid/",
        test_data=f"{DATA_ROOT}/{DATASET_ID}/test/",
        embedding_dim=16, learning_rate=learning_rate,
        net_regularizer=None, embedding_regularizer=None,
        steps_per_call=32, compute_dtype="bfloat16",
        monitor="AUC", metrics=["AUC", "logloss"],
        reduce_lr_on_plateau=True, epochs=epochs, verbose=1)
    if model_name.endswith("_nouser"):
        params["use_features"] = [f"C{i+1}" for i in range(12)]
    if real_model == "PPNet":
        params.update(gate_priors=["user_id"], gate_hidden_dim=128,
                      hidden_units=[512, 256, 128], net_dropout=0.1)
    elif real_model == "DNN":
        params.update(hidden_units=[512, 256, 128], net_dropout=0.1)
    elif real_model.startswith("APG"):
        params.update(hidden_units=[512, 256, 128], rank_k=8,
                      net_dropout=0.1)
    set_logger(params)
    seed_everything(2019)

    data_dir = os.path.join(params["data_root"], DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), params)
    model = get_model(real_model)(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()

    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=epochs)
    train_s = time.time() - t0
    print(json.dumps({"phase": "train", "model": model_name,
                      "seconds": round(train_s, 1),
                      "examples_per_s_incl_compile":
                          round(train_gen.num_samples * epochs / train_s)}),
          flush=True)

    import pyarrow.parquet as pq
    for split in ("valid", "test"):
        if split == "valid":
            gen = valid_gen
        else:
            gen = RankDataLoader(
                fm, stage="test",
                test_data=f"{DATA_ROOT}/{DATASET_ID}/{split}/",
                batch_size=batch_size, data_format="parquet",
                device_cache=True, shuffle=False,
                **({"use_features": params["use_features"]}
                   if "use_features" in params else {})).make_iterator()
        logs = model.evaluate(gen)
        true_logit = np.load(f"{RAW}/{split}_true_logit.npy")
        y_true = np.concatenate([
            pq.read_table(p, columns=["label"])["label"].to_numpy()
            for p in sorted(glob.glob(
                f"{DATA_ROOT}/{DATASET_ID}/{split}/*.parquet"))])
        bayes = evaluate_metrics(
            y_true[:len(true_logit)],
            1 / (1 + np.exp(-true_logit[:len(y_true)])), ["AUC", "logloss"])
        print(json.dumps({
            "phase": "eval", "split": split, "model": model_name,
            "AUC": round(float(logs["AUC"]), 6),
            "logloss": round(float(logs["logloss"]), 6),
            "bayes_AUC": round(float(bayes["AUC"]), 6),
            "AUC_gap_to_bayes": round(float(bayes["AUC"] - logs["AUC"]), 6),
        }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["build", "train", "all"])
    ap.add_argument("--model", default="PPNet")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8192)
    args = ap.parse_args()
    if args.phase in ("build", "all"):
        phase_build()
    if args.phase in ("train", "all"):
        phase_train(args.model, epochs=args.epochs,
                    batch_size=args.batch_size)
