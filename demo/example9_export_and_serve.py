"""Train briefly, export a serving bundle, and serve it with the Predictor.

No reference equivalent — the reference stops at training checkpoints
(rank_model.py:417-423). This demo shows the TPU-first serving path:
export_model() writes a self-contained bundle; Predictor AOT-compiles
fixed batch buckets so serve-time requests never trigger a compile.
Run from the repo root: ``python demo/example9_export_and_serve.py``.
"""

import logging
import os
import sys

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
from fuxictr_tpu.serving import Predictor, export_model

if __name__ == "__main__":
    params = {
        "model_id": "DeepFM_demo9", "model_root": "./demo_out/",
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

    # ---- export a self-contained bundle ---------------------------------
    bundle = export_model(
        model, "./demo_out/deepfm_bundle",
        params=dict(model="DeepFM", **{k: params[k] for k in
                                       ("embedding_dim", "hidden_units")}))
    logging.info("Exported bundle: %s (%s)", bundle, os.listdir(bundle))

    # ---- serve it --------------------------------------------------------
    pred = Predictor(bundle, batch_buckets=(1, 8, 64), aot=True)
    df = pd.read_parquet(params["test_data"]).head(10)
    request = {c: df[c].to_numpy() for c in df.columns
               if c not in feature_map.labels}
    probs = pred.predict(request)
    logging.info("Served %d rows -> probabilities %s", len(df),
                 np.round(probs, 4))
    assert probs.shape == (10,) and np.all((probs >= 0) & (probs <= 1))

    # ---- int8-quantized serving (4x smaller tables) ----------------------
    pred_q = Predictor(bundle, batch_buckets=(1, 8, 64), aot=False,
                       quantize="int8")
    probs_q = pred_q.predict(request)
    logging.info("int8-quantized serve, max |dp| = %.5f",
                 float(np.max(np.abs(probs_q - probs))))
    assert np.allclose(probs_q, probs, atol=0.02)
    logging.info("example9 OK")
