"""Behavior-sequence family throughput sweep at Amazon-Electronics scale:
stage the 2.6M-row dataset (histories up to L=100) in HBM once, then train
DIN / DIEN / BST / TransAct through the device-epoch path. Reports each
model's epoch-2 (steady-state) examples/s and valid AUC vs the planted
0.8373 Bayes ceiling (history-blind control: 0.7167).

Usage: python scripts/bench_seq_amazon.py [--models A,B,...]
"""

import argparse
import json
import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_ROOT = os.environ.get("AMAZON_DATA", "/tmp/ctr_scale/amazon_data")
DATASET_ID = os.environ.get("AMAZON_DATASET_ID", "amazon_syn")

TARGETS = ("item_id", "cate_id")
HISTORIES = ("item_history", "cate_history")

MODEL_PARAMS = {
    "DIN": dict(dnn_hidden_units=[512, 256, 128],
                attention_hidden_units=[64],
                din_target_field=TARGETS, din_sequence_field=HISTORIES),
    "DIEN": dict(dnn_hidden_units=[512, 256, 128], gru_type="AUGRU",
                 attention_hidden_units=[64], aux_loss_alpha=0,
                 dien_neg_seq_field=None,
                 dien_target_field=TARGETS, dien_sequence_field=HISTORIES),
    "BST": dict(dnn_hidden_units=[512, 256, 128], num_heads=2,
                seq_pooling_type="mean",
                bst_target_field=TARGETS, bst_sequence_field=HISTORIES),
    "TransAct": dict(dcn_hidden_units=[512, 256, 128], dim_feedforward=256,
                     target_item_field="item_id",
                     sequence_item_field="item_history"),
}


class _RateHandler(logging.Handler):
    def __init__(self):
        super().__init__()
        self.rates = []

    def emit(self, record):
        m = re.search(r"\((\d+) examples/s\)", record.getMessage())
        if m:
            self.rates.append(int(m.group(1)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(MODEL_PARAMS))
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=2048)
    ap.add_argument("--seq-slice", default="1", choices=["0", "1"],
                    help="A/B the vocab-slice history gather "
                         "(ops/embedding.py seq_slice_gather)")
    args = ap.parse_args()

    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models import get_model, seed_everything

    base = dict(
        dataset_id=DATASET_ID, data_root=DATA_ROOT + "/",
        model_root="/tmp/ctr_scale/checkpoints/", data_format="parquet",
        device_cache=True, batch_size=args.batch_size, shuffle=True,
        train_data=f"{DATA_ROOT}/{DATASET_ID}/train/",
        valid_data=f"{DATA_ROOT}/{DATASET_ID}/valid/",
        embedding_dim=32, learning_rate=1e-3, net_dropout=0.1,
        steps_per_call=32, compute_dtype="bfloat16", monitor="AUC",
        metrics=["AUC", "logloss"], epochs=args.epochs, verbose=1)
    set_logger(dict(base, model_id="seq_bench"))
    seed_everything(2019)

    data_dir = os.path.join(base["data_root"], DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"), base)

    t0 = time.time()
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **base).make_iterator()
    print(f"staged {train_gen.num_samples} train + {valid_gen.num_samples} "
          f"valid rows in {time.time() - t0:.0f}s", flush=True)

    for name in args.models.split(","):
        params = dict(base, model=name,
                      model_id=f"{name}_seq_{DATASET_ID}",
                      seq_slice_gather=args.seq_slice == "1",
                      **MODEL_PARAMS.get(name, {}))
        seed_everything(2019)
        model = get_model(name)(fm, **params)
        handler = _RateHandler()
        logging.getLogger().addHandler(handler)
        t0 = time.time()
        try:
            model.fit(train_gen, validation_data=valid_gen,
                      epochs=args.epochs)
            logs = model.evaluate(valid_gen)
            print(json.dumps({
                "model": name, "seq_slice": args.seq_slice,
                "total_s": round(time.time() - t0, 1),
                "epoch_rates": handler.rates,
                "steady_examples_per_s": max(handler.rates or [0]),
                "valid_AUC": round(float(logs["AUC"]), 6),
                "valid_logloss": round(float(logs["logloss"]), 6),
            }), flush=True)
        except Exception as exc:
            print(json.dumps({"model": name, "error": repr(exc)}),
                  flush=True)
        finally:
            logging.getLogger().removeHandler(handler)
        del model


if __name__ == "__main__":
    main()
