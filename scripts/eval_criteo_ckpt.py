"""Evaluate a saved full-Criteo checkpoint on valid/test with big batches
+ fast parquet label reads (Bayes-ceiling comparison)."""
import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

RAW = os.environ.get("CRITEO_RAW", "/tmp/ctr_scale/criteo_full_raw")
DATA_ROOT = os.environ.get("CRITEO_DATA", "/tmp/ctr_scale/criteo_full_data")
DATASET_ID = os.environ.get("CRITEO_DATASET_ID", "criteo_full_syn")


def log(msg):
    import time as _t
    print(f"[{_t.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.metrics import evaluate_metrics
    from fuxictr_tpu.models import get_model, seed_everything

    log("imports done")
    seed_everything(2019)
    data_dir = os.path.join(DATA_ROOT, DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"),
            {"embedding_dim": 16})
    model = get_model("DCNv2")(
        fm, model_id="DCNv2_criteo_full", embedding_dim=16,
        model_structure="parallel",
        stacked_dnn_hidden_units=[1024, 512, 256],
        parallel_dnn_hidden_units=[1024, 512, 256],
        num_cross_layers=4, net_dropout=0.1, compute_dtype="bfloat16",
        model_root="/tmp/ctr_scale/checkpoints/")
    log("model built")
    model.init_params()
    log("init_params done")
    model.load_weights(model.checkpoint)
    log("load_weights done")
    for split in ("valid", "test"):
        t0 = time.time()
        gen = RankDataLoader(
            fm, stage="test",
            test_data=f"{DATA_ROOT}/{DATASET_ID}/{split}/",
            batch_size=8192, data_format="parquet", streaming=True,
            shuffle=False).make_iterator()
        log(f"eval {split} start")
        logs = model.evaluate(gen, metrics=["AUC", "logloss"])
        true_logit = np.load(f"{RAW}/{split}_true_logit.npy")
        y_true = np.concatenate([
            __import__("pyarrow.parquet", fromlist=["x"]).read_table(
                p, columns=["label"])["label"].to_numpy()
            for p in sorted(glob.glob(
                f"{DATA_ROOT}/{DATASET_ID}/{split}/*.parquet"))])
        bayes = evaluate_metrics(
            y_true[:len(true_logit)],
            1 / (1 + np.exp(-true_logit[:len(y_true)])),
            ["AUC", "logloss"])
        print(json.dumps({
            "phase": "eval", "split": split, "model": "DCNv2",
            "AUC": round(float(logs["AUC"]), 6),
            "logloss": round(float(logs["logloss"]), 6),
            "bayes_AUC": round(float(bayes["AUC"]), 6),
            "bayes_logloss": round(float(bayes["logloss"]), 6),
            "AUC_gap_to_bayes": round(float(bayes["AUC"] - logs["AUC"]), 6),
            "eval_seconds": round(time.time() - t0, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
