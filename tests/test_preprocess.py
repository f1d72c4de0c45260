"""Offline preprocessing pipeline tests, incl. byte-parity vs the
reference's committed tiny_parquet golden (built from the same tiny_csv)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from fuxictr_tpu.preprocess import (FeatureProcessor, Normalizer, Tokenizer,
                                    build_dataset, split_train_test)

TINY_CSV = "/root/reference/data/tiny_csv"

TAOBAO_CAT_COLS = ["userid", "adgroup_id", "pid", "cate_id", "campaign_id",
                   "customer", "brand", "cms_segid", "cms_group_id",
                   "final_gender_code", "age_level", "pvalue_level",
                   "shopping_level", "occupation"]


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    fp = FeatureProcessor(
        feature_cols=[{"name": TAOBAO_CAT_COLS, "active": True,
                       "dtype": "str", "type": "categorical"}],
        label_col={"name": "clk", "dtype": "float"},
        dataset_id="tiny_built", data_root=root)
    build_dataset(fp, train_data=f"{TINY_CSV}/train_sample.csv",
                  valid_data=f"{TINY_CSV}/valid_sample.csv",
                  test_data=f"{TINY_CSV}/test_sample.csv")
    return os.path.join(root, "tiny_built")


def test_feature_map_matches_reference_golden(built):
    ref = json.load(open("/root/reference/data/tiny_parquet/feature_map.json"))
    mine = json.load(open(os.path.join(built, "feature_map.json")))
    assert (mine["num_fields"], mine["total_features"], mine["input_length"]) \
        == (ref["num_fields"], ref["total_features"], ref["input_length"])
    rf = {k: v for e in ref["features"] for k, v in e.items()}
    mf = {k: v for e in mine["features"] for k, v in e.items()}
    assert list(rf) == list(mf)
    for k in rf:
        rv = {kk: vv for kk, vv in rf[k].items() if kk != "source"}
        mv = {kk: vv for kk, vv in mf[k].items() if kk != "source"}
        assert rv == mv, k


def test_encoded_ids_match_reference_golden(built):
    for split in ["train", "valid", "test"]:
        ref = pd.read_parquet(
            f"/root/reference/data/tiny_parquet/{split}.parquet")
        mine = pd.read_parquet(os.path.join(built, f"{split}.parquet"))
        for c in ref.columns:
            np.testing.assert_array_equal(
                ref[c].to_numpy(), mine[c].to_numpy(), err_msg=f"{split}:{c}")


def test_artifacts_written(built):
    for f in ["feature_map.json", "feature_vocab.json",
              "feature_processor.pkl"]:
        assert os.path.exists(os.path.join(built, f))
    vocab = json.load(open(os.path.join(built, "feature_vocab.json")))
    assert vocab["pid"]["__PAD__"] == 0
    assert vocab["pid"]["__OOV__"] == max(vocab["pid"].values())


def test_sequence_share_embedding_build(tmp_path):
    fp = FeatureProcessor(
        feature_cols=[
            {"name": TAOBAO_CAT_COLS, "active": True, "dtype": "str",
             "type": "categorical"},
            {"name": "click_sequence", "active": True, "dtype": "str",
             "type": "sequence", "share_embedding": "adgroup_id",
             "splitter": "^", "max_len": 5}],
        label_col={"name": "clk", "dtype": "float"},
        dataset_id="tiny_seq_built", data_root=str(tmp_path))
    build_dataset(fp, train_data=f"{TINY_CSV}/train_sample.csv",
                  valid_data=f"{TINY_CSV}/valid_sample.csv",
                  test_data=f"{TINY_CSV}/test_sample.csv")
    fm = json.load(open(tmp_path / "tiny_seq_built" / "feature_map.json"))
    golden = json.load(open("/root/reference/data/tiny_seq/feature_map.json"))
    mf = {k: v for e in fm["features"] for k, v in e.items()}
    gf = {k: v for e in golden["features"] for k, v in e.items()}
    # shared vocab: same size and oov as golden; post-padding layout
    assert mf["click_sequence"]["vocab_size"] == gf["click_sequence"]["vocab_size"]
    assert mf["click_sequence"]["max_len"] == 5
    assert mf["adgroup_id"]["vocab_size"] == gf["adgroup_id"]["vocab_size"]
    df = pd.read_parquet(tmp_path / "tiny_seq_built" / "train" / "part_00000.parquet") \
        if (tmp_path / "tiny_seq_built" / "train").is_dir() \
        else pd.read_parquet(tmp_path / "tiny_seq_built" / "train.parquet")
    seq = np.stack(df["click_sequence"].to_numpy())
    assert seq.shape[1] == 5
    # post padding: zeros trail
    row = seq[1]
    nz = row != 0
    assert nz[:nz.sum()].all()


def test_tokenizer_min_freq_and_oov():
    tok = Tokenizer(min_freq=2)
    tok.fit_on_series(pd.Series(["a", "a", "b", "b", "b", "c"]))
    assert tok.vocab["b"] == 1 and tok.vocab["a"] == 2  # count desc
    assert "c" not in tok.vocab
    ids = tok.encode_category(pd.Series(["b", "c", "a"]))
    assert ids.tolist() == [1, tok.vocab["__OOV__"], 2]


def test_tokenizer_sequence_pre_post_padding():
    tok = Tokenizer(splitter="^", max_len=3, padding="post")
    tok.fit_on_series(pd.Series(["a^b", "a^b^c^d"]))
    out = np.stack(tok.encode_sequence(pd.Series(["a^b", "a^b^c^d"])))
    assert out.shape == (2, 3)
    assert out[0, 2] == 0                      # post-pad
    assert (out[1] != 0).all()                 # post-truncate keeps first 3
    tok2 = Tokenizer(splitter="^", max_len=3, padding="pre")
    tok2.vocab = tok.vocab
    out2 = np.stack(tok2.encode_sequence(pd.Series(["a^b"])))
    assert out2[0, 0] == 0                     # pre-pad


def test_normalizer_roundtrip():
    x = np.array([1.0, 2.0, 3.0, 4.0])
    n = Normalizer("StandardScaler")
    n.fit(x)
    out = n.transform(x)
    np.testing.assert_allclose(out.mean(), 0, atol=1e-9)
    n2 = Normalizer("MinMaxScaler")
    n2.fit(x)
    assert n2.transform(x).min() == 0 and n2.transform(x).max() == 1


def test_split_train_test_fraction():
    df = pd.DataFrame({"a": range(100)})
    tr, va, te = split_train_test(df, valid_size=0.1, test_size=10,
                                  split_type="sequential")
    assert len(tr) == 80 and len(va) == 10 and len(te) == 10
    assert te["a"].tolist() == list(range(90, 100))   # tail = test
    assert va["a"].tolist() == list(range(80, 90))


def test_criteo_bucketizer():
    from fuxictr_tpu.datasets.criteo import CustomizedFeatureProcessor
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        fp = CustomizedFeatureProcessor(
            feature_cols=[{"name": "I1", "active": True, "dtype": "float",
                           "type": "categorical", "preprocess":
                           "convert_to_bucket", "dtype": "int"}],
            label_col={"name": "y", "dtype": "float"},
            dataset_id="x", data_root=d)
        df = pd.DataFrame({"I1": [1.0, 2.0, 100.0, np.nan], "y": [0, 1, 0, 1]})
        out = fp.preprocess(df)
        assert out["I1"].tolist()[:3] == [1, 2, int(np.floor(np.log(100) ** 2))]


def test_avazu_time_features():
    from fuxictr_tpu.datasets.avazu import CustomizedFeatureProcessor
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        fp = CustomizedFeatureProcessor(
            feature_cols=[{"name": "hour", "active": True, "dtype": "str",
                           "type": "categorical"}],
            label_col={"name": "y", "dtype": "float"}, dataset_id="x",
            data_root=d)
        df = pd.DataFrame({"hour": ["14102100", "14102523"]})  # Tue, Sat
        assert fp.convert_weekday(df).tolist() == [2, 6]
        assert fp.convert_weekend(df).tolist() == [0, 1]
        assert fp.convert_hour(df).tolist() == [0, 23]
