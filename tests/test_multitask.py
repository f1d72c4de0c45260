"""Multitask runtime + MMoE/PLE/ShareBottom tests on a dual-label schema."""

import jax
import numpy as np
import pytest

from fuxictr_tpu.models.registry import MODEL_REGISTRY
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)

import fuxictr_tpu.models.zoo  # noqa: F401


@pytest.fixture(scope="module")
def mtl_fm():
    fm = make_synthetic_feature_map(num_categorical=5, num_numeric=2,
                                    vocab_size=50, embedding_dim=8)
    fm.labels = ["click", "conversion"]
    fm.set_column_index()
    return fm


def _mtl_batch(fm, n=16, seed=0):
    batch = make_synthetic_batch(fm, batch_size=n, seed=seed)
    batch.pop("label", None)
    rng = np.random.default_rng(seed)
    batch["click"] = rng.integers(0, 2, n).astype(np.float32)
    batch["conversion"] = rng.integers(0, 2, n).astype(np.float32)
    return batch


@pytest.mark.parametrize("name", ["ShareBottom", "MMoE", "PLE"])
def test_multitask_model_trains(name, mtl_fm):
    model = MODEL_REGISTRY[name](
        mtl_fm, model_id=f"{name}_smoke", embedding_dim=8, num_tasks=2,
        task=["binary_classification", "binary_classification"],
        model_root="/tmp/fx_mtl_smoke")
    model.init_params()
    batch = jax.device_put(_mtl_batch(mtl_fm))
    step = model._make_train_step()
    state, loss = step(model.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    model.state = state

    class _Gen(list):
        pass

    gen = _Gen([_mtl_batch(mtl_fm, seed=1)])
    logs = model.evaluate(gen)
    assert "click_AUC" in logs and "conversion_AUC" in logs and "AUC" in logs
    preds = model.predict(gen)
    assert set(preds) == {"click", "conversion"}
    assert all(np.isfinite(v).all() for v in preds.values())


@pytest.mark.parametrize("name,kw", [
    ("PPNet", dict(gate_priors=("C1", "C2"))),
    ("APG_DeepFM", dict(rank_k=4)),
    ("APG_DeepFM", dict(rank_k=4, overparam_p=8, condition_mode="group-wise",
                        condition_features=("C1",))),
    ("APG_DCNv2", dict(rank_k=4)),
])
def test_dynamic_weight_models(name, kw, mtl_fm):
    fm = make_synthetic_feature_map(num_categorical=5, num_numeric=2,
                                    vocab_size=50, embedding_dim=8)
    model = MODEL_REGISTRY[name](fm, model_id=f"{name}_smoke",
                                 embedding_dim=8,
                                 model_root="/tmp/fx_dyn_smoke", **kw)
    model.init_params()
    batch = jax.device_put(make_synthetic_batch(fm, batch_size=16, seed=0))
    step = model._make_train_step()
    state, loss = step(model.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_multitask_device_cache(tmp_path, mtl_fm):
    """Device-cache loader through the multitask runtime: evaluate matches
    the in-memory loop exactly, and the on-device epoch path trains."""
    import pandas as pd

    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader

    rng = np.random.default_rng(0)
    n = 50
    cols = {}
    for name, spec in mtl_fm.features.items():
        if spec["type"] == "categorical":
            cols[name] = rng.integers(1, spec["vocab_size"], n)
        else:
            cols[name] = rng.normal(size=n).astype(np.float32)
    cols["click"] = rng.integers(0, 2, n).astype(np.float32)
    cols["conversion"] = rng.integers(0, 2, n).astype(np.float32)
    path = str(tmp_path / "mtl.parquet")
    pd.DataFrame(cols).to_parquet(path)

    model = MODEL_REGISTRY["MMoE"](
        mtl_fm, model_id="MMoE_cache", embedding_dim=8, num_tasks=2,
        task=["binary_classification", "binary_classification"],
        steps_per_call=2, model_root=str(tmp_path))
    model.init_params()

    mem = RankDataLoader(mtl_fm, stage="test", test_data=path,
                         batch_size=16, shuffle=False,
                         data_format="parquet").make_iterator()
    cache = DeviceCacheDataLoader(mtl_fm, path, batch_size=16,
                                  shuffle=False)
    ref = model.evaluate(mem)
    got = model.evaluate(cache)
    for k in ref:
        assert abs(ref[k] - got[k]) < 1e-6, k
    chunked = DeviceCacheDataLoader(mtl_fm, path, batch_size=16,
                                    shuffle=False, hbm_limit_gb=1e-6)
    assert chunked.chunked
    got2 = model.evaluate(chunked)
    for k in ref:
        assert abs(ref[k] - got2[k]) < 1e-6, k

    train = DeviceCacheDataLoader(mtl_fm, path, batch_size=16, shuffle=True)
    model.fit(train, validation_data=cache, epochs=2)
    logs = model.evaluate(cache)
    assert all(np.isfinite(v) for v in logs.values())
