"""Pre-embedded float vectors as model inputs (``type: embedding``).

Mirrors /root/reference/demo/example8_DCN_with_emb_feature_as_input.py.
Run from the repo root: ``python demo/example8_*.py``.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

from fuxictr_tpu.config import print_to_json, set_logger
from fuxictr_tpu.data import RankDataLoader
from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models import seed_everything
from fuxictr_tpu.models.zoo.ranking import DCN
from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset

if __name__ == "__main__":
    params = {
        "model_id": "DCN_demo8", "model_root": "./demo_out/",
        "dataset_id": "tiny_example8", "data_root": "./demo_out/data/",
        "data_format": "parquet",
        "train_data": "./data/tiny_emb/train.parquet",
        "valid_data": "./data/tiny_emb/valid.parquet",
        "test_data": "./data/tiny_emb/test.parquet",
        "rebuild_dataset": True,
        "feature_cols": [
            {"active": True, "dtype": "float", "name": "feat1",
             "type": "numeric"},
            {"active": True, "dtype": "float", "name": "feat2",
             "type": "numeric"},
            {"active": True, "dtype": "list", "name": "feat3",
             "pretrain_dim": 96, "type": "embedding"}],
        "label_col": {"name": "label", "dtype": "float"},
        "embedding_dim": 16, "dnn_hidden_units": [64, 32],
        "num_cross_layers": 3,
        "batch_size": 32, "epochs": 1, "shuffle": True, "seed": 2019,
        "learning_rate": 1e-3, "monitor": "AUC", "metrics": ["logloss", "AUC"],
    }
    set_logger(params)
    logging.info("Params: " + print_to_json(params))
    seed_everything(params["seed"])

    feature_encoder = FeatureProcessor(**params)
    params["train_data"], params["valid_data"], params["test_data"] = \
        build_dataset(feature_encoder, **params)

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    feature_map = FeatureMap(params["dataset_id"], data_dir)
    feature_map.load(os.path.join(data_dir, "feature_map.json"), params)

    train_gen, valid_gen = RankDataLoader(
        feature_map, stage="train", **params).make_iterator()
    model = DCN(feature_map, **params)
    model.fit(train_gen, validation_data=valid_gen, epochs=params["epochs"])

    logging.info("***** Validation evaluation *****")
    model.evaluate(valid_gen)
