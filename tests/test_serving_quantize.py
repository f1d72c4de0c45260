"""Int8 quantized serving: Predictor(quantize="int8") must load a float
bundle into int8 tables + per-row scales and predict close to the f32
path; training with quantized tables must be rejected."""

import numpy as np
import pandas as pd
import pytest

from tests.test_serving import DATA_DIR, _train_tiny


def _bundle(tmp_path):
    from fuxictr_tpu.serving import export_model
    model, fm = _train_tiny(tmp_path)
    bundle = export_model(model, str(tmp_path / "bundle"),
                          params=dict(model="DeepFM", embedding_dim=4,
                                      hidden_units=[16, 8]))
    return model, bundle


def test_quantized_predict_close_to_f32(tmp_path):
    import flax
    import jax
    from fuxictr_tpu.serving import Predictor
    from fuxictr_tpu.serving.quantize import table_bytes

    model, bundle = _bundle(tmp_path)
    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(50)
    batch = {c: df[c].to_numpy() for c in df.columns}

    f32 = Predictor(bundle, batch_buckets=(64,), aot=False)
    q8 = Predictor(bundle, batch_buckets=(64,), aot=False, quantize="int8")

    # the quantized state really is int8 + scales
    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(
            jax.device_get(q8.model.state.params)))
    table_leaves = [p for p in flat
                    if p[-1].startswith("table_")
                    and not p[-1].endswith("_scale")]
    assert table_leaves, "no fused table params found"
    assert all(np.asarray(flat[p]).dtype == np.int8 for p in table_leaves)
    scale_leaves = [p[:-1] + (p[-1] + "_scale",) for p in table_leaves]
    assert all(s in flat for s in scale_leaves)
    assert table_bytes(q8.model.state.params) < \
        table_bytes(f32.model.state.params)

    want = f32.predict(batch)
    got = q8.predict(batch)
    # int8 per-row symmetric quantization: probabilities stay close
    np.testing.assert_allclose(got, want, atol=0.02)
    # and padding invariance still holds on the quantized path
    np.testing.assert_allclose(q8.predict(
        {c: v[:3] for c, v in batch.items()}), got[:3], rtol=1e-5,
        atol=1e-6)


def test_quantize_roundtrip_error_bound():
    from fuxictr_tpu.serving.quantize import quantize_row_int8
    rng = np.random.default_rng(0)
    w = rng.normal(scale=0.1, size=(100, 16)).astype(np.float32)
    q, s = quantize_row_int8(w)
    err = np.abs(q.astype(np.float32) * s - w)
    # max error per element is s/2 = max|row|/254
    assert (err <= s / 2 + 1e-7).all()
    # zero rows stay exactly zero
    q0, s0 = quantize_row_int8(np.zeros((3, 4)))
    assert (q0 == 0).all()


def test_export_time_quantized_bundle(tmp_path):
    """export_model(quantize="int8") writes int8 tables into the bundle;
    the Predictor loads it directly (no quantize arg needed) and matches
    the load-time-quantized path exactly (same rounding)."""
    import flax
    import jax
    import json
    import os
    from fuxictr_tpu.serving import Predictor, export_model

    model, fm = _train_tiny(tmp_path)
    params = dict(model="DeepFM", embedding_dim=4, hidden_units=[16, 8])
    f32_bundle = export_model(model, str(tmp_path / "f32"), params=params)
    q_bundle = export_model(model, str(tmp_path / "q8"), params=params,
                            quantize="int8")

    with open(os.path.join(q_bundle, "model_meta.json")) as fd:
        meta = json.load(fd)
    assert meta["params"]["table_dtype"] == "int8"
    # the quantized weights blob really is smaller
    assert os.path.getsize(os.path.join(q_bundle, "weights.msgpack")) < \
        os.path.getsize(os.path.join(f32_bundle, "weights.msgpack"))

    df = pd.read_parquet(f"{DATA_DIR}/train.parquet").head(50)
    batch = {c: df[c].to_numpy() for c in df.columns}

    direct = Predictor(q_bundle, batch_buckets=(64,), aot=False)
    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(
            jax.device_get(direct.model.state.params)))
    assert any(np.asarray(v).dtype == np.int8 for v in flat.values())

    load_time = Predictor(f32_bundle, batch_buckets=(64,), aot=False,
                          quantize="int8")
    np.testing.assert_allclose(direct.predict(batch),
                               load_time.predict(batch), rtol=1e-6,
                               atol=1e-7)
    # asking for int8 on an already-int8 bundle is a no-op, not an error
    noop = Predictor(q_bundle, batch_buckets=(64,), aot=False,
                     quantize="int8")
    np.testing.assert_allclose(noop.predict(batch), direct.predict(batch),
                               rtol=1e-6, atol=1e-7)


def test_fit_rejects_quantized_tables(tmp_path):
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.zoo.ranking import DeepFM

    fm = FeatureMap("tiny_parquet", DATA_DIR)
    fm.load(f"{DATA_DIR}/feature_map.json", {"embedding_dim": 4})
    model = DeepFM(fm, embedding_dim=4, hidden_units=(4,),
                   model_root=str(tmp_path), table_dtype="int8")
    with pytest.raises(NotImplementedError):
        model.fit(None)
