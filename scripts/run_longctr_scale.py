"""LongCTR quality-at-scale benchmark: lifelong sequences (L up to 1000)
with a planted LONG-RANGE signal (scripts/make_longctr_scale.py).

The planted early-repeat + early-affinity terms are structurally
invisible to a last-100 window; the generator saves both ceilings
(smoke-validated: Bayes AUC ~0.92 vs plug-in window predictor ~0.77).
Retrieval models (SIM/ETA/TWIN: GSU->ESU over the full sequence) should
recover far more of the gap than ANY model truncated to max_len=100 —
measured here as AUC vs both ceilings on the same rows.

Usage: python scripts/run_longctr_scale.py --model SIM --max-len 1000
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW = os.environ.get("LONGCTR_RAW", "/tmp/ctr_scale/longctr_raw")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="SIM")
    ap.add_argument("--max-len", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--embedding-dim", type=int, default=32)
    ap.add_argument("--topk", type=int, default=100)
    ap.add_argument("--loader", default="host", choices=["host", "device"],
                    help="host = side-table join per batch on the host "
                    "(reference semantics); device = stage sequences + item "
                    "table in HBM, join on device (LongCTRDeviceCacheLoader)")
    ap.add_argument("--gsu-type", default="soft", choices=["soft", "hard"],
                    help="SIM GSU: soft qk top-k, or the paper's hard "
                    "(category-match) search")
    ap.add_argument("--product-pooling", action="store_true",
                    help="append target*history product pooling + match "
                    "counts over the model's retrieved set (family-wide "
                    "extension: SIM/ETA/SDIM/TWIN/MIRRN)")
    ap.add_argument("--no-lr-decay", action="store_true",
                    help="keep lr constant (plateau decay freezes the slow "
                    "item-embedding learning the planted signal needs)")
    ap.add_argument("--patience", type=int, default=2)
    ap.add_argument("--no-user", action="store_true",
                    help="drop the explicit user_feat id so the HISTORY is "
                    "the only user representation (the honest long-range "
                    "test: with a memorizable per-user id + stationary "
                    "synthetic preferences, a model can bypass the history "
                    "entirely — measured as identical AUC at max_len 100 "
                    "vs 1000)")
    args = ap.parse_args()

    import numpy as np

    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.data.longctr_loader import LongCTRDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.metrics import evaluate_metrics
    from fuxictr_tpu.models import get_model, seed_everything

    variant = ("_nouser" if args.no_user else "") + (
        "_devcache" if args.loader == "device" else "") + (
        "_hard" if args.gsu_type == "hard" else "") + (
        "_pp" if args.product_pooling else "")
    params = dict(
        model_id=f"{args.model}_L{args.max_len}{variant}_longctr_syn",
        dataset_id="longctr_syn", data_root=RAW + "/",
        model_root="/tmp/ctr_scale/checkpoints/", data_format="parquet",
        data_loader=LongCTRDataLoader,
        train_data=f"{RAW}/train.parquet", valid_data=f"{RAW}/valid.parquet",
        test_data=f"{RAW}/test.parquet",
        user_info=f"{RAW}/user_info.parquet",
        item_info=f"{RAW}/item_info.parquet",
        max_len=args.max_len, batch_size=args.batch_size, shuffle=True,
        device_cache=args.loader == "device",
        embedding_dim=args.embedding_dim, learning_rate=1e-3,
        net_regularizer=None, embedding_regularizer=None,
        steps_per_call=8, compute_dtype="bfloat16",
        monitor="AUC", metrics=["AUC", "logloss", "gAUC"],
        group_id="user_index" if args.no_user else "user_feat",
        **({"use_features": ["item_id", "cate_id"]} if args.no_user else {}),
        reduce_lr_on_plateau=not args.no_lr_decay,
        early_stop_patience=args.patience,
        epochs=args.epochs, verbose=1,
        # retrieval shapes scale with the window
        short_seq_len=min(100, args.max_len), topk=min(args.topk,
                                                       args.max_len),
        attention_dim=64, dnn_hidden_units=[512, 256],
        gsu_type=args.gsu_type, product_pooling=args.product_pooling,
    )
    set_logger(params)
    seed_everything(2019)

    fm = FeatureMap("longctr_syn", RAW)
    fm.load(os.path.join(RAW, "feature_map.json"), params)
    model = get_model(args.model)(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()

    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=args.epochs)
    train_s = time.time() - t0
    print(json.dumps({
        "phase": "train", "model": args.model, "max_len": args.max_len,
        "seconds": round(train_s, 1),
        "examples_per_s_incl_compile":
            round(train_gen.num_samples * args.epochs / train_s)}),
        flush=True)

    for split in ("valid", "test"):
        if split == "valid":
            gen, path = valid_gen, f"{RAW}/valid.parquet"
        else:
            path = f"{RAW}/test.parquet"
            gen = RankDataLoader(
                fm, stage="test", **{**params, "test_data": path,
                                     "shuffle": False}).make_iterator()
        logs = model.evaluate(gen)
        import pandas as pd
        true_logit = np.load(f"{RAW}/{split}_true_logit.npy")
        y_true = pd.read_parquet(path, columns=["clk"])["clk"].to_numpy()
        bayes = evaluate_metrics(
            y_true, 1 / (1 + np.exp(-true_logit)), ["AUC", "logloss"])
        out = {
            "phase": "eval", "split": split, "model": args.model,
            "max_len": args.max_len,
            "AUC": round(float(logs["AUC"]), 6),
            "gAUC": round(float(logs.get("gAUC", float("nan"))), 6),
            "logloss": round(float(logs["logloss"]), 6),
            "bayes_AUC": round(float(bayes["AUC"]), 6),
            "AUC_gap_to_bayes": round(float(bayes["AUC"] - logs["AUC"]), 6),
        }
        win_path = f"{RAW}/{split}_window_logit.npy"
        if os.path.exists(win_path):
            win = evaluate_metrics(
                y_true, 1 / (1 + np.exp(-np.load(win_path))), ["AUC"])
            out["window_AUC"] = round(float(win["AUC"]), 6)
            out["AUC_vs_window"] = round(float(logs["AUC"] - win["AUC"]), 6)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
