"""Serve an exported bundle over HTTP and query it with a JSON client.

No reference equivalent — the reference stops at training checkpoints
(rank_model.py:417-423). This demo trains briefly, exports a bundle
(optionally int8-quantized), starts the stdlib HTTP model server
(fuxictr_tpu.serving.server, also available as the ``fuxictr_tpu-serve``
console command), and issues /healthz, /info, and /predict requests.
Run from the repo root: ``python demo/example10_http_model_server.py``.
"""

import json
import logging
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")   # demos run anywhere; drop for TPU

import numpy as np
import pandas as pd

from fuxictr_tpu.config import set_logger
from fuxictr_tpu.data import RankDataLoader
from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models import seed_everything
from fuxictr_tpu.models.zoo.ranking import DeepFM
from fuxictr_tpu.serving import PredictionServer, Predictor, export_model


def post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


if __name__ == "__main__":
    params = {
        "model_id": "DeepFM_demo10", "model_root": "./demo_out/",
        "dataset_id": "tiny_parquet", "data_root": "./data/",
        "data_format": "parquet",
        "train_data": "./data/tiny_parquet/train.parquet",
        "valid_data": "./data/tiny_parquet/valid.parquet",
        "test_data": "./data/tiny_parquet/test.parquet",
        "embedding_dim": 4, "hidden_units": [64, 32],
        "batch_size": 32, "epochs": 1, "shuffle": True, "seed": 2019,
        "learning_rate": 1e-3, "monitor": "AUC", "metrics": ["logloss", "AUC"],
    }
    set_logger(params)
    seed_everything(params["seed"])

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    feature_map = FeatureMap(params["dataset_id"], data_dir)
    feature_map.load(os.path.join(data_dir, "feature_map.json"), params)

    train_gen, valid_gen = RankDataLoader(
        feature_map, stage="train", **params).make_iterator()
    model = DeepFM(feature_map, **params)
    model.fit(train_gen, validation_data=valid_gen, epochs=params["epochs"])

    # int8-quantized bundle: ~4x smaller tables, measured-negligible AUC cost
    bundle = export_model(
        model, "./demo_out/deepfm_http_bundle", quantize="int8",
        params=dict(model="DeepFM", **{k: params[k] for k in
                                       ("embedding_dim", "hidden_units")}))

    server = PredictionServer(
        Predictor(bundle, batch_buckets=(1, 8, 64), aot=False),
        host="127.0.0.1", port=0)
    server.start_background()
    logging.info("model server on port %d", server.port)

    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/healthz") as resp:
        logging.info("healthz: %s", json.loads(resp.read()))
    with urllib.request.urlopen(
            f"http://127.0.0.1:{server.port}/info") as resp:
        info = json.loads(resp.read())
        logging.info("info: model=%s version=%s", info["model"],
                     info.get("fuxictr_tpu_version"))

    df = pd.read_parquet(params["test_data"]).head(6)
    rows = [{c: df[c].iloc[i].item() for c in df.columns
             if c not in feature_map.labels} for i in range(len(df))]
    out = post(server.port, "/predict", {"rows": rows})
    probs = np.asarray(out["probabilities"])
    logging.info("served %d rows over HTTP in %.2f ms -> %s",
                 out["n"], out["latency_ms"], np.round(probs, 4))
    assert probs.shape == (6,) and np.all((probs >= 0) & (probs <= 1))

    server.shutdown()
    logging.info("example10 OK")
