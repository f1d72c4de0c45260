"""Frozen pretrained embeddings as feature weights (userid vectors).

Mirrors /root/reference/demo/example5_DeepFM_with_pretrained_emb_as_weights.py.
Run from the repo root: ``python demo/example5_*.py``.
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
from fuxictr_tpu.models.zoo.ranking import DeepFM
from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset

if __name__ == "__main__":
    params = {
        "model_id": "DeepFM_demo5", "model_root": "./demo_out/",
        "dataset_id": "tiny_example5", "data_root": "./demo_out/data/",
        "data_format": "csv",
        "train_data": "./data/tiny_csv_raw/train_sample.csv",
        "valid_data": "./data/tiny_csv_raw/valid_sample.csv",
        "test_data": "./data/tiny_csv_raw/test_sample.csv",
        "min_categr_count": 1,
        "feature_cols": [
            {"name": "userid", "active": True, "dtype": "str",
             "type": "categorical",
             "pretrained_emb": "./data/tiny_csv_raw/userid_emb_dim8.npz",
             "embedding_dim": 8, "freeze_emb": True},
            {"name": ["adgroup_id", "pid", "cate_id", "campaign_id",
                      "customer", "brand", "cms_segid", "cms_group_id",
                      "final_gender_code", "age_level", "pvalue_level",
                      "shopping_level", "occupation"],
             "active": True, "dtype": "str", "type": "categorical"}],
        "label_col": {"name": "clk", "dtype": "float"},
        "embedding_dim": 8, "hidden_units": [64, 32],
        "batch_size": 32, "epochs": 1, "shuffle": True, "seed": 2019,
        "learning_rate": 1e-3, "monitor": "AUC", "metrics": ["logloss", "AUC"],
    }
    set_logger(params)
    logging.info("Params: " + print_to_json(params))
    seed_everything(params["seed"])

    feature_encoder = FeatureProcessor(**params)
    params["train_data"], params["valid_data"], params["test_data"] = \
        build_dataset(feature_encoder, **params)
    params["data_format"] = "parquet"

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    feature_map = FeatureMap(params["dataset_id"], data_dir)
    feature_map.load(os.path.join(data_dir, "feature_map.json"), params)

    train_gen, valid_gen = RankDataLoader(
        feature_map, stage="train", **params).make_iterator()
    model = DeepFM(feature_map, **params)
    model.fit(train_gen, validation_data=valid_gen, epochs=params["epochs"])

    logging.info("***** Validation evaluation *****")
    model.evaluate(valid_gen)
