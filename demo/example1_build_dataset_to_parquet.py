"""Build a parquet dataset (+ feature_map.json, vocab) from raw CSV.

Mirrors /root/reference/demo/example1_build_dataset_to_parquet.py against
the fuxictr_tpu API. Run from the repo root: ``python demo/example1_*.py``.
"""

import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuxictr_tpu.config import print_to_json, set_logger
from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset

if __name__ == "__main__":
    params = {
        "model_id": "example1", "model_root": "./demo_out/",
        "dataset_id": "tiny_example1", "data_root": "./demo_out/data/",
        "data_format": "csv",
        "train_data": "./data/tiny_csv_raw/train_sample.csv",
        "valid_data": "./data/tiny_csv_raw/valid_sample.csv",
        "test_data": "./data/tiny_csv_raw/test_sample.csv",
        "min_categr_count": 1,
        "feature_cols": [
            {"name": ["userid", "adgroup_id", "pid", "cate_id",
                      "campaign_id", "customer", "brand", "cms_segid",
                      "cms_group_id", "final_gender_code", "age_level",
                      "pvalue_level", "shopping_level", "occupation"],
             "active": True, "dtype": "str", "type": "categorical"}],
        "label_col": {"name": "clk", "dtype": "float"},
    }
    set_logger(params)
    logging.info("Params: " + print_to_json(params))

    feature_encoder = FeatureProcessor(**params)
    train, valid, test = build_dataset(feature_encoder, **params)
    logging.info("Dataset built: %s | %s | %s", train, valid, test)
