"""On-device grouped metrics (VERDICT r3 #4): exact gAUC/avgAUC computed on
the accelerator (metrics.py:device_grouped_components) must match the host
grouped_metrics pass (itself sklearn-parity,
/root/reference/fuxictr/metrics.py:99-130 semantics) to 1e-6, through the
device-cache eval path and the mesh streaming eval path."""

import numpy as np
import pandas as pd
import pytest

from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map


def _unit_case(n, n_groups, ties=False, pad=0, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, n_groups, n).astype(np.int32)
    s = (rng.integers(0, 40, n) / 40.0 if ties
         else rng.random(n)).astype(np.float32)
    y = (rng.random(n) < 0.3).astype(np.float32)
    mask = np.ones(n, bool)
    if pad:
        mask[-pad:] = False
    return s, y, g, mask


@pytest.mark.parametrize("ties,pad", [(False, 0), (True, 0), (True, 57)])
def test_device_grouped_matches_host(ties, pad):
    import jax
    import jax.numpy as jnp

    from fuxictr_tpu.metrics import (device_grouped_components,
                                     finish_device_grouped, grouped_metrics)
    s, y, g, mask = _unit_case(5000, 300, ties=ties, pad=pad)
    host = grouped_metrics(y[mask], s[mask].astype(np.float64), g[mask],
                           ["gAUC", "avgAUC"])
    comps = jax.jit(device_grouped_components)(
        jnp.asarray(s), jnp.asarray(y), jnp.asarray(g), jnp.asarray(mask))
    dev = finish_device_grouped(jax.device_get(comps), ["gAUC", "avgAUC"])
    for k in host:
        assert abs(host[k] - dev[k]) < 1e-6, (k, host[k], dev[k])


def test_group_size_bound_raises():
    import jax
    import jax.numpy as jnp

    from fuxictr_tpu import metrics as M
    s, y, g, mask = _unit_case(2000, 4)
    comps = jax.jit(M.device_grouped_components)(
        jnp.asarray(s), jnp.asarray(y), jnp.asarray(g), jnp.asarray(mask))
    comps = jax.device_get(comps)
    M.finish_device_grouped(comps, ["gAUC"])            # within bound: fine
    import unittest.mock as mock
    with mock.patch.object(M, "DEVICE_GAUC_MAX_GROUP_ROWS", 10):
        with pytest.raises(OverflowError):
            M.finish_device_grouped(comps, ["gAUC"])


def _build_cached_model(tmp_path, n=512, monkey_bound=None):
    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.models.zoo.ranking import DNN

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=32, embedding_dim=4)
    fm.group_id = "C1"          # group over an int-block column
    rng = np.random.default_rng(0)
    df = pd.DataFrame({name: (rng.integers(1, 32, n)
                              if spec["type"] == "categorical"
                              else rng.normal(size=n).astype(np.float32))
                       for name, spec in fm.features.items()})
    df["label"] = rng.integers(0, 2, n).astype(np.float32)
    pq = tmp_path / "eval.parquet"
    df.to_parquet(pq)
    loader = DeviceCacheDataLoader(fm, str(pq), batch_size=64,
                                   shuffle=False)
    m = DNN(fm, embedding_dim=4, hidden_units=(8,),
            model_root=str(tmp_path))
    m.init_params()
    return m, loader


def test_cached_device_eval_gauc_matches_host(tmp_path):
    m, loader = _build_cached_model(tmp_path)
    want = ["AUC", "gAUC", "avgAUC", "logloss"]
    dev = m.evaluate(loader, metrics=want)
    m.kwargs["device_metrics"] = False          # force host pass
    host = m.evaluate(loader, metrics=want)
    for k in want:
        assert abs(dev[k] - host[k]) < 1e-6, (k, dev[k], host[k])


def test_cached_eval_overflow_falls_back(tmp_path, monkeypatch):
    from fuxictr_tpu import metrics as M
    m, loader = _build_cached_model(tmp_path)
    monkeypatch.setattr(M, "DEVICE_GAUC_MAX_GROUP_ROWS", 2)
    logs = m.evaluate(loader, metrics=["AUC", "gAUC"])   # falls back, no raise
    m.kwargs["device_metrics"] = False
    host = m.evaluate(loader, metrics=["AUC", "gAUC"])
    for k in host:
        assert abs(logs[k] - host[k]) < 1e-9


def test_mesh_streaming_eval_matches_host(tmp_path):
    """Mesh evaluation must compute AUC/gAUC/logloss from sharded device
    arrays (no full-dataset host gather) and agree with the single-device
    host metrics."""
    import jax

    from fuxictr_tpu.models import base as base_mod
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.parallel import make_mesh
    from fuxictr_tpu.utils.synthetic import make_synthetic_batch

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=32, embedding_dim=4)
    fm.group_id = "C1"
    batches = [make_synthetic_batch(fm, 32, seed=s) for s in range(4)]

    single = DNN(fm, embedding_dim=4, hidden_units=(8,),
                 model_root=str(tmp_path / "s"))
    single.init_params()
    single.kwargs["device_metrics"] = False
    want = ["AUC", "gAUC", "logloss"]
    host = single.evaluate(batches, metrics=want)

    meshed = DNN(fm, embedding_dim=4, hidden_units=(8,),
                 model_root=str(tmp_path / "m"))
    meshed.init_params()
    meshed.distribute(make_mesh(n_data=4, n_model=2))

    called = {"stream": False}
    orig = base_mod.RankModel._device_eval_streaming

    def spy(self, *a, **kw):
        called["stream"] = True
        return orig(self, *a, **kw)

    base_mod.RankModel._device_eval_streaming = spy
    try:
        dev = meshed.evaluate(batches, metrics=want)
    finally:
        base_mod.RankModel._device_eval_streaming = orig
    assert called["stream"], "mesh eval should take the streaming path"
    for k in want:
        assert abs(dev[k] - host[k]) < 1e-5, (k, dev[k], host[k])
