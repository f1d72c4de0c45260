"""Model-zoo throughput sweep at full-Criteo scale: stage the dataset in
HBM once, then train each flagship ranking model for 2 epochs through the
device-resident epoch path. Reports per-model epoch-2 (steady-state)
examples/s and valid AUC vs the planted Bayes ceiling (0.820045).

Usage: python scripts/bench_zoo_criteo.py [--models A,B,...] [--epochs 2]
"""

import argparse
import json
import logging
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_ROOT = os.environ.get("CRITEO_DATA", "/tmp/ctr_scale/criteo_full_data")
DATASET_ID = os.environ.get("CRITEO_DATASET_ID", "criteo_full_syn")

MODEL_PARAMS = {
    "DeepFM": dict(hidden_units=[1024, 512, 256]),
    "WideDeep": dict(hidden_units=[1024, 512, 256]),
    "DCNv2": dict(model_structure="parallel",
                  stacked_dnn_hidden_units=[1024, 512, 256],
                  parallel_dnn_hidden_units=[1024, 512, 256],
                  num_cross_layers=4),
    "xDeepFM": dict(dnn_hidden_units=[1024, 512, 256],
                    cin_hidden_units=[32, 32]),
    "AutoInt": dict(dnn_hidden_units=[1024, 512, 256], num_heads=2,
                    attention_layers=3, attention_dim=64),
    "FinalMLP": dict(mlp1_hidden_units=[1024, 512, 256],
                     mlp2_hidden_units=[512, 256], num_heads=2),
    "MaskNet": dict(dnn_hidden_units=[1024, 512, 256]),
    "FiBiNET": dict(hidden_units=[1024, 512, 256],
                    bilinear_type="field_interaction"),
}


class _RateHandler(logging.Handler):
    """Captures per-epoch 'Train loss ... (N examples/s)' lines."""

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
    ap.add_argument("--batch-size", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--rng-impl", default=None)
    ap.add_argument("--remat", action="store_true")
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
        embedding_dim=16, learning_rate=args.lr, net_dropout=0.1,
        **({"rng_impl": args.rng_impl} if args.rng_impl else {}),
        **({"remat": True} if args.remat else {}),
        steps_per_call=32, compute_dtype="bfloat16", monitor="AUC",
        metrics=["AUC", "logloss"], epochs=args.epochs, verbose=1)
    set_logger(dict(base, model_id="zoo_bench"))
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
                      model_id=f"{name}_zoo_{DATASET_ID}",
                      **MODEL_PARAMS.get(name, {}))
        seed_everything(2019)
        handler = _RateHandler()
        logging.getLogger().addHandler(handler)
        t0 = time.time()
        model = None
        try:
            model = get_model(name)(fm, **params)
            model.fit(train_gen, validation_data=valid_gen,
                      epochs=args.epochs)
            logs = model.evaluate(valid_gen)
            print(json.dumps({
                "model": name, "total_s": round(time.time() - t0, 1),
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
        import gc
        gc.collect()
        try:                      # drop dead buffers after an OOM
            import jax
            jax.clear_caches()
        except Exception:
            pass


if __name__ == "__main__":
    main()
