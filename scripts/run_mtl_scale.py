"""Multitask-at-scale benchmark: ShareBottom vs MMoE vs PLE on the
planted task-structure dataset (scripts/make_mtl_scale.py — shared,
CONFLICTING, and task-exclusive pairwise signal over 10M rows).

Per-task AUC is reported against each task's own planted Bayes ceiling.
The conflicting pairs carry opposite-sign signal for click vs conversion
through the SAME latent vectors — the setting gated-expert architectures
(MMoE/PLE) exist for; ShareBottom is the negative-transfer control.

Usage: python scripts/run_mtl_scale.py --phase all --model MMoE
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW = os.environ.get("MTL_RAW", "/tmp/ctr_scale/mtl_raw")
DATA_ROOT = os.environ.get("MTL_DATA", "/tmp/ctr_scale/mtl_data")
DATASET_ID = "mtl_syn"

FEATURE_COLS = [{"name": [f"C{i+1}" for i in range(16)], "active": True,
                 "dtype": "int", "type": "categorical",
                 "min_categr_count": 2}]
LABEL_COLS = [{"name": "click", "dtype": "float"},
              {"name": "conversion", "dtype": "float"}]


def base_params():
    return dict(
        dataset_id=DATASET_ID, data_root=DATA_ROOT + "/",
        model_root="/tmp/ctr_scale/checkpoints/", data_format="csv",
        train_data=f"{RAW}/train.csv", valid_data=f"{RAW}/valid.csv",
        test_data=f"{RAW}/test.csv",
        feature_cols=FEATURE_COLS, label_col=LABEL_COLS,
        min_categr_count=2, data_block_size=4_000_000)


def phase_build():
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset
    params = dict(base_params(), model_id="build_mtl")
    set_logger(params)
    t0 = time.time()
    fp = FeatureProcessor(**params)
    train, valid, test = build_dataset(fp, **params)
    print(json.dumps({"phase": "build",
                      "seconds": round(time.time() - t0, 1),
                      "train": train, "valid": valid, "test": test}),
          flush=True)


def phase_train(model_name="MMoE", epochs=2, batch_size=8192,
                learning_rate=None):
    if learning_rate is None:
        # sqrt-scaling vs the B=8192 recipe lr 1e-3 (the Criteo
        # ladder's measured-good choice: 2e-3 at 4x batch)
        learning_rate = 1e-3 * (batch_size / 8192) ** 0.5
    import numpy as np

    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.metrics import evaluate_metrics
    from fuxictr_tpu.models import get_model, seed_everything

    params = base_params()
    params.update(
        model_id=f"{model_name}_{DATASET_ID}", model=model_name,
        batch_size=batch_size, shuffle=True, device_cache=True,
        data_format="parquet",
        train_data=f"{DATA_ROOT}/{DATASET_ID}/train/",
        valid_data=f"{DATA_ROOT}/{DATASET_ID}/valid/",
        test_data=f"{DATA_ROOT}/{DATASET_ID}/test/",
        embedding_dim=16, learning_rate=learning_rate,
        net_regularizer=None, embedding_regularizer=None,
        steps_per_call=32, compute_dtype="bfloat16",
        num_tasks=2, task=["binary_classification", "binary_classification"],
        monitor="AUC", metrics=["AUC", "logloss"],
        reduce_lr_on_plateau=True, epochs=epochs, verbose=1)
    if model_name == "MMoE":
        params.update(num_experts=8, expert_hidden_units=[512, 256],
                      gate_hidden_units=[128], tower_hidden_units=[128, 64],
                      net_dropout=0.1)
    elif model_name == "PLE":
        params.update(num_layers=1, num_shared_experts=4,
                      num_specific_experts=2,
                      expert_hidden_units=[512, 256],
                      gate_hidden_units=[128], tower_hidden_units=[128, 64],
                      net_dropout=0.1)
    elif model_name == "ShareBottom":
        params.update(bottom_hidden_units=[512, 256],
                      tower_hidden_units=[128, 64], net_dropout=0.1)
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
                device_cache=True, shuffle=False).make_iterator()
        logs = model.evaluate(gen)
        out = {"phase": "eval", "split": split, "model": model_name}
        for task in ("click", "conversion"):
            true_logit = np.load(f"{RAW}/{split}_true_logit_{task}.npy")
            y_true = np.concatenate([
                pq.read_table(p, columns=[task])[task].to_numpy()
                for p in sorted(glob.glob(
                    f"{DATA_ROOT}/{DATASET_ID}/{split}/*.parquet"))])
            bayes = evaluate_metrics(
                y_true[:len(true_logit)],
                1 / (1 + np.exp(-true_logit[:len(y_true)])), ["AUC"])
            out[f"{task}_AUC"] = round(float(logs[f"{task}_AUC"]), 6)
            out[f"{task}_bayes_AUC"] = round(float(bayes["AUC"]), 6)
            out[f"{task}_gap"] = round(
                float(bayes["AUC"] - logs[f"{task}_AUC"]), 6)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["build", "train", "all"])
    ap.add_argument("--model", default="MMoE")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8192)
    args = ap.parse_args()
    if args.phase in ("build", "all"):
        phase_build()
    if args.phase in ("train", "all"):
        phase_train(args.model, epochs=args.epochs,
                    batch_size=args.batch_size)
