"""Train DeepFM on a prebuilt parquet dataset (feature_map.json present).

Mirrors /root/reference/demo/example2_DeepFM_with_parquet_input.py.
Run from the repo root: ``python demo/example2_*.py``.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")   # demos run anywhere; drop for TPU

from fuxictr_tpu.config import print_to_json, set_logger
from fuxictr_tpu.data import RankDataLoader
from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models import seed_everything
from fuxictr_tpu.models.zoo.ranking import DeepFM

if __name__ == "__main__":
    params = {
        "model_id": "DeepFM_demo2", "model_root": "./demo_out/",
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
    logging.info("Params: " + print_to_json(params))
    seed_everything(params["seed"])

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    feature_map = FeatureMap(params["dataset_id"], data_dir)
    feature_map.load(os.path.join(data_dir, "feature_map.json"), params)
    logging.info("Feature specs: " + print_to_json(feature_map.features))

    train_gen, valid_gen = RankDataLoader(
        feature_map, stage="train", **params).make_iterator()
    model = DeepFM(feature_map, **params)
    model.fit(train_gen, validation_data=valid_gen, epochs=params["epochs"])

    logging.info("***** Validation evaluation *****")
    model.evaluate(valid_gen)

    logging.info("***** Test evaluation *****")
    test_gen = RankDataLoader(feature_map, stage="test",
                              **params).make_iterator()
    model.evaluate(test_gen)
