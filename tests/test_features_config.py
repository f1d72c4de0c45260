"""FeatureMap + config-system tests against the reference tiny fixtures."""

import json
import os

import pytest

from fuxictr_tpu import (FeatureMap, Monitor, load_config, load_dataset_config,
                         load_model_config, not_in_whitelist)

TINY = "/root/reference/data"
DEEPFM_CFG = "/root/reference/model_zoo/DeepFM/DeepFM_torch/config"
DCN_CFG = "/root/reference/model_zoo/DCN/DCN_torch/config"


def test_feature_map_load_tiny_parquet():
    fm = FeatureMap("tiny_parquet", os.path.join(TINY, "tiny_parquet"))
    fm.load(os.path.join(TINY, "tiny_parquet/feature_map.json"),
            {"embedding_dim": 4})
    assert fm.num_fields == 14
    assert fm.total_features == 485
    assert fm.input_length == 14
    assert fm.labels == ["clk"]
    assert fm.sum_emb_out_dim() == 14 * 4
    assert fm.get_column_index("userid") == 0
    assert fm.get_column_index("clk") == 14


def test_feature_map_sequence_column_ranges():
    fm = FeatureMap("tiny_seq", os.path.join(TINY, "tiny_seq"))
    fm.load(os.path.join(TINY, "tiny_seq/feature_map.json"),
            {"embedding_dim": 4})
    assert fm.get_column_index("click_sequence") == list(range(14, 19))
    assert fm.input_length == 19
    assert fm.features["click_sequence"]["share_embedding"] == "adgroup_id"


def test_feature_map_save_roundtrip(tmp_path):
    src = os.path.join(TINY, "tiny_parquet/feature_map.json")
    fm = FeatureMap("tiny_parquet", str(tmp_path))
    fm.load(src, {})
    out = tmp_path / "feature_map.json"
    fm.save(str(out))
    assert json.load(open(src)) == json.load(open(out))


def test_feature_map_dataset_id_mismatch():
    fm = FeatureMap("wrong_id")
    with pytest.raises(RuntimeError):
        fm.load(os.path.join(TINY, "tiny_parquet/feature_map.json"), {})


def test_use_features_and_feature_specs():
    fm = FeatureMap("tiny_parquet", os.path.join(TINY, "tiny_parquet"))
    fm.load(os.path.join(TINY, "tiny_parquet/feature_map.json"),
            {"use_features": ["userid", "adgroup_id"],
             "feature_specs": [{"name": "userid", "embedding_dim": 8}]})
    assert list(fm.features) == ["userid", "adgroup_id"]
    assert fm.features["userid"]["embedding_dim"] == 8


def test_load_config_merges_base_and_expid():
    params = load_config(DCN_CFG, "DCN_test")
    assert params["model"] == "DCN"
    assert params["dataset_id"] == "tiny_parquet"
    assert params["model_id"] == "DCN_test"
    assert params["batch_size"] == 128
    assert params["embedding_dim"] == 4
    # Base keys survive the merge
    assert params["early_stop_patience"] == 2
    # dataset section merged in
    assert params["data_format"] == "parquet"


def test_load_model_config_missing_expid():
    with pytest.raises(RuntimeError):
        load_model_config(DEEPFM_CFG, "NoSuchExp")


def test_load_dataset_config_missing_id():
    with pytest.raises(RuntimeError):
        load_dataset_config(DEEPFM_CFG, "no_such_dataset")


def test_monitor_weighted_sum():
    m = Monitor({"AUC": 1, "logloss": -1})
    assert m.get_value({"AUC": 0.8, "logloss": 0.3}) == pytest.approx(0.5)
    assert Monitor("AUC").get_metrics() == ["AUC"]


def test_not_in_whitelist():
    assert not_in_whitelist("a", []) is False
    assert not_in_whitelist("a", ["b"]) is True
    assert not_in_whitelist("a", "a") is False
