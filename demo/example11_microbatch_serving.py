"""Micro-batched serving under concurrent clients.

No reference equivalent — the reference stops at training checkpoints
(rank_model.py:417-423). The TPU executes one program at a time, so
concurrent single-row requests must be COALESCED, not parallelized: this
demo starts the HTTP model server with ``microbatch=True`` (the
MicroBatcher dispatcher merges concurrent requests into shared AOT-bucket
batches, serving/microbatch.py) and fires 16 threads of tiny requests,
then shows how many device programs actually ran.

Run from the repo root: ``python demo/example11_microbatch_serving.py``.
"""

import json
import logging
import os
import sys
import threading
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

if __name__ == "__main__":
    params = {
        "model_id": "DeepFM_demo11", "model_root": "./demo_out/",
        "dataset_id": "tiny_parquet", "data_root": "./data/",
        "data_format": "parquet",
        "train_data": "./data/tiny_parquet/train.parquet",
        "valid_data": "./data/tiny_parquet/valid.parquet",
        "test_data": "./data/tiny_parquet/test.parquet",
        "embedding_dim": 4, "hidden_units": [64, 32],
        "batch_size": 32, "epochs": 1, "shuffle": True, "seed": 2019,
        "learning_rate": 1e-3, "monitor": "AUC", "metrics": ["AUC"],
    }
    set_logger(params)
    seed_everything(params["seed"])

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    feature_map = FeatureMap(params["dataset_id"], data_dir)
    feature_map.load(os.path.join(data_dir, "feature_map.json"), params)
    train_gen, valid_gen = RankDataLoader(
        feature_map, stage="train", **params).make_iterator()
    model = DeepFM(feature_map, **params)
    model.fit(train_gen, validation_data=valid_gen, epochs=1)

    bundle = export_model(
        model, "./demo_out/deepfm_mb_bundle",
        params=dict(model="DeepFM", **{k: params[k] for k in
                                       ("embedding_dim", "hidden_units")}))
    server = PredictionServer(
        Predictor(bundle, batch_buckets=(1, 8, 64), aot=False),
        host="127.0.0.1", port=0, microbatch=True, linger_ms=10)
    server.start_background()
    logging.info("micro-batching model server on port %d", server.port)

    df = pd.read_parquet(params["test_data"]).head(16)
    results = [None] * len(df)

    def one(i):
        row = {c: df[c].iloc[i].item() for c in df.columns
               if c not in feature_map.labels}
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/predict",
            data=json.dumps({"rows": [row]}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            results[i] = json.loads(resp.read())["probabilities"][0]

    threads = [threading.Thread(target=one, args=(i,))
               for i in range(len(df))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    probs = np.asarray(results)
    mb = server.batcher
    logging.info(
        "%d concurrent 1-row requests served by %d device batches "
        "(avg %.1f rows/batch) -> %s", len(df), mb.batches_run,
        mb.rows_run / max(mb.batches_run, 1), np.round(probs[:6], 4))
    assert probs.shape == (16,) and np.all((probs >= 0) & (probs <= 1))
    assert mb.batches_run < len(df), "requests should have been coalesced"
    server.shutdown()
