"""Int8-table quality check at Criteo scale: evaluate the trained DCNv2
checkpoint on the test split with float32 tables vs int8 + per-row scales
(the serving quantization, serving/quantize.py). Reports the AUC/logloss
delta the 4x table compression costs.

Run after bench.py / run_criteo_scale.py has left
/tmp/ctr_scale/checkpoints/criteo_full_syn/DCNv2_criteo_full_syn.model.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DATA_ROOT = os.environ.get("CRITEO_DATA", "/tmp/ctr_scale/criteo_full_data")
DATASET_ID = os.environ.get("CRITEO_DATASET_ID", "criteo_full_syn")
SPLIT = os.environ.get("SPLIT", "test")

MODEL_KW = dict(
    embedding_dim=16, model_structure="parallel",
    stacked_dnn_hidden_units=[1024, 512, 256],
    parallel_dnn_hidden_units=[1024, 512, 256],
    num_cross_layers=4, net_dropout=0.1, compute_dtype="bfloat16",
    model_root="/tmp/ctr_scale/checkpoints/")


def build(table_dtype=None, model_id="DCNv2_criteo_full_syn"):
    # each model gets its OWN FeatureMap: the table_dtype knob is carried
    # on the FeatureMap and flax setup() re-reads it at every apply, so
    # sharing one fm across an f32 and an int8 model would corrupt the
    # f32 model's param expectations
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models import get_model
    data_dir = os.path.join(DATA_ROOT, DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"),
            {"embedding_dim": 16})
    kw = dict(MODEL_KW)
    if table_dtype:
        kw["table_dtype"] = table_dtype
    m = get_model("DCNv2")(fm, model_id=model_id, **kw)
    m.init_params()
    return m, fm


def main():
    import jax
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.models import seed_everything
    from fuxictr_tpu.serving.quantize import quantize_param_tree, table_bytes

    seed_everything(2019)
    f32, fm = build()
    f32.load_weights(f32.checkpoint)

    q8, fm_q = build(table_dtype="int8")
    q8.state = q8.state.replace(params=jax.device_put(quantize_param_tree(
        jax.device_get(f32.state.params), jax.device_get(q8.state.params))))

    out = {"metric": "int8_table_quality", "split": SPLIT,
           "table_mb_f32": round(table_bytes(f32.state.params) / 1e6, 1),
           "table_mb_int8": round(table_bytes(q8.state.params) / 1e6, 1)}

    for tag, model in (("f32", f32), ("int8", q8)):
        gen = RankDataLoader(
            fm, stage="test",
            test_data=f"{DATA_ROOT}/{DATASET_ID}/{SPLIT}/",
            batch_size=8192, data_format="parquet", streaming=True,
            shuffle=False).make_iterator()
        t0 = time.time()
        logs = model.evaluate(gen, metrics=["AUC", "logloss"])
        out[f"AUC_{tag}"] = round(float(logs["AUC"]), 6)
        out[f"logloss_{tag}"] = round(float(logs["logloss"]), 6)
        out[f"eval_s_{tag}"] = round(time.time() - t0, 1)
    out["AUC_delta"] = round(out["AUC_f32"] - out["AUC_int8"], 6)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
