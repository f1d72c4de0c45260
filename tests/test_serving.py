"""Serving subsystem: export bundle → Predictor parity, AOT batch buckets,
online raw-feature encoding parity with the offline pipeline."""

import os

import numpy as np
import pandas as pd
import pytest

DATA_DIR = "/root/reference/data/tiny_parquet"
FM_JSON = f"{DATA_DIR}/feature_map.json"


def _train_tiny(tmp_path):
    """Fit DeepFM briefly on the tiny_parquet fixture."""
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.zoo.ranking import DeepFM

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(FM_JSON, {"embedding_dim": 4})
    model = DeepFM(fm, embedding_dim=4, hidden_units=(16, 8),
                   model_root=str(tmp_path), batch_size=32)
    loader = RankDataLoader(fm, stage="train", train_data=DATA_DIR,
                            valid_data=DATA_DIR, data_format="parquet",
                            batch_size=32, data_root=str(tmp_path))
    train_gen, valid_gen = loader.make_iterator()
    model.fit(train_gen, validation_data=valid_gen, epochs=1)
    return model, fm


def test_export_predict_parity(tmp_path):
    """Predictor(bundle).predict == the trained model's own predictions,
    at every batch bucket (padding must not leak into real rows)."""
    import jax
    from fuxictr_tpu.serving import Predictor, export_model

    model, fm = _train_tiny(tmp_path)
    bundle = export_model(model, str(tmp_path / "bundle"),
                          params=dict(model="DeepFM", embedding_dim=4,
                                      hidden_units=[16, 8]))
    assert os.path.exists(os.path.join(bundle, "model_meta.json"))
    assert os.path.exists(os.path.join(bundle, "weights.msgpack"))
    assert os.path.exists(os.path.join(bundle, "feature_map.json"))

    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(50)
    batch = {c: df[c].to_numpy() for c in df.columns}
    batch_full = dict(batch, __mask__=np.ones(len(df), np.float32))
    want = np.asarray(model._make_predict_step()(
        model.state, jax.device_put(batch_full))).reshape(-1)

    pred = Predictor(bundle, batch_buckets=(1, 8, 64), aot=True)
    got = pred.predict(batch)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # single row → bucket 1; 3 rows → bucket 8 (pad rows must not matter)
    one = {c: v[:1] for c, v in batch.items()}
    np.testing.assert_allclose(pred.predict(one), want[:1],
                               rtol=1e-5, atol=1e-6)
    three = {c: v[:3] for c, v in batch.items()}
    np.testing.assert_allclose(pred.predict(three), want[:3],
                               rtol=1e-5, atol=1e-6)


def test_predict_without_labels(tmp_path):
    """Serve-time requests have no label column."""
    from fuxictr_tpu.serving import Predictor, export_model
    model, fm = _train_tiny(tmp_path)
    bundle = export_model(model, str(tmp_path / "bundle"),
                          params=dict(model="DeepFM", embedding_dim=4,
                                      hidden_units=[16, 8]))
    pred = Predictor(bundle, batch_buckets=(8,), aot=False)
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(5)
    batch = {c: df[c].to_numpy() for c in df.columns
             if c not in fm.labels}
    out = pred.predict(batch)
    assert out.shape == (5,)
    assert np.all((out >= 0) & (out <= 1))


def test_online_encoding_parity(tmp_path):
    """encode(raw csv rows) == the offline build's parquet encodings, and
    predict_raw works end to end (csv → ids → probability)."""
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import run_expid
    from fuxictr_tpu.serving import Predictor, export_model

    params = load_config("./configs/tiny", "DeepFM_csv_test")
    params["model_root"] = str(tmp_path / "ckpt")
    params["data_root"] = str(tmp_path / "data")
    params["epochs"] = 1
    result = run_expid("./configs/tiny", "DeepFM_csv_test", params=params)
    model = result["model"]

    bundle = export_model(model, str(tmp_path / "bundle"), params=params)
    assert os.path.exists(os.path.join(bundle, "feature_processor.pkl"))
    pred = Predictor(bundle, batch_buckets=(64,), aot=False)

    raw = pd.read_csv("/root/reference/data/tiny_csv/train_sample.csv").head(20)
    encoded = pred.encode(raw)

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    built = pd.read_parquet(os.path.join(data_dir, "train.parquet")).head(20)
    for col in built.columns:
        if col in encoded:
            np.testing.assert_array_equal(
                np.asarray(list(encoded[col])),
                np.asarray(list(built[col].to_numpy())),
                err_msg=f"online/offline encoding mismatch in {col}")

    probs = pred.predict_raw(raw)
    assert probs.shape == (20,)
    assert np.all((probs >= 0) & (probs <= 1))


def test_export_pins_disabled_bucketing(tmp_path):
    """A model trained with table_size_buckets=() must export a bundle
    whose meta records [] (NOT the library default edges), so the
    Predictor rebuilds the same single-table layout and the weights
    restore (code-review finding, round 3)."""
    import json

    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.serving import Predictor, export_model
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    # vocab 9000 would split under the default edges (8192, 131072)
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=1,
                                    vocab_size=[9000, 40], embedding_dim=4)
    model = DNN(fm, model_id="nobuckets", embedding_dim=4, hidden_units=[8],
                table_size_buckets=(), model_root=str(tmp_path))
    model.init_params()
    assert "table_d4" in model.state.params["embedding"]

    bundle = export_model(model, str(tmp_path / "bundle"),
                          params=dict(model="DNN", embedding_dim=4,
                                      hidden_units=[8]))
    meta = json.load(open(os.path.join(bundle, "model_meta.json")))
    assert meta["params"]["table_size_buckets"] == []

    pred = Predictor(bundle, batch_buckets=(4,))
    batch = make_synthetic_batch(fm, batch_size=4, seed=0)
    y_direct = np.asarray(
        model._make_predict_step()(model.state, batch)).reshape(-1)
    y_served = np.asarray(pred.predict(batch)).reshape(-1)
    np.testing.assert_allclose(y_served, y_direct, rtol=1e-5, atol=1e-5)
