"""Device grouped MRR/NDCG@k + multitask device eval (VERDICT r4 #5).

The device ranked pass (metrics.py:device_ranked_components) must match
the host grouped_metrics rank block (/root/reference/fuxictr/metrics.py:
132-160 semantics) to 1e-6 — including at >=100k groups — and the
multitask mesh eval must compute per-task metrics from sharded device
arrays with host parity.
"""

from functools import partial

import numpy as np
import pytest

from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)


def _case(n, n_groups, ties=False, pad=0, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, n_groups, n).astype(np.int32)
    s = (rng.integers(0, 40, n) / 40.0 if ties
         else rng.random(n)).astype(np.float32)
    y = (rng.random(n) < 0.3).astype(np.float32)
    mask = np.ones(n, bool)
    if pad:
        mask[-pad:] = False
    return s, y, g, mask


METS = ["MRR", "NDCG(k=1)", "NDCG(k=5)"]


@pytest.mark.parametrize("ties,pad", [(False, 0), (True, 0), (True, 57)])
def test_device_ranked_matches_host(ties, pad):
    import jax
    import jax.numpy as jnp

    from fuxictr_tpu.metrics import (device_ranked_components,
                                     finish_device_ranked, grouped_metrics)
    s, y, g, mask = _case(5000, 300, ties=ties, pad=pad)
    host = grouped_metrics(y[mask].astype(np.float64),
                           s[mask].astype(np.float64), g[mask], METS)
    comps = jax.jit(partial(device_ranked_components, ks=(1, 5)))(
        jnp.asarray(s), jnp.asarray(y), jnp.asarray(g), jnp.asarray(mask))
    dev = finish_device_ranked(jax.device_get(comps), METS)
    for k in host:
        assert abs(host[k] - dev[k]) < 1e-6, (k, host[k], dev[k])


def test_device_ranked_100k_groups_within_1e6():
    """The VERDICT acceptance bar: device NDCG@k == host to 1e-6 at
    >=100k groups."""
    import jax
    import jax.numpy as jnp

    from fuxictr_tpu.metrics import (device_ranked_components,
                                     finish_device_ranked, grouped_metrics)
    s, y, g, mask = _case(600_000, 120_000, ties=True, pad=123, seed=3)
    host = grouped_metrics(y[mask].astype(np.float64),
                           s[mask].astype(np.float64), g[mask], METS)
    comps = jax.jit(partial(device_ranked_components, ks=(1, 5)))(
        jnp.asarray(s), jnp.asarray(y), jnp.asarray(g), jnp.asarray(mask))
    dev = finish_device_ranked(jax.device_get(comps), METS)
    for k in host:
        assert abs(host[k] - dev[k]) < 1e-6, (k, host[k], dev[k])


def test_mesh_streaming_eval_ranked_matches_host(tmp_path):
    """RankModel mesh eval computes MRR/NDCG on device with host parity."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.parallel import make_mesh

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=32, embedding_dim=4)
    fm.group_id = "C1"
    batches = [make_synthetic_batch(fm, 32, seed=s) for s in range(4)]
    want = ["AUC", "gAUC", "MRR", "NDCG(k=3)", "logloss"]

    single = DNN(fm, embedding_dim=4, hidden_units=(8,),
                 model_root=str(tmp_path / "s"))
    single.init_params()
    single.kwargs["device_metrics"] = False
    host = single.evaluate(batches, metrics=want)

    meshed = DNN(fm, embedding_dim=4, hidden_units=(8,),
                 model_root=str(tmp_path / "m"))
    meshed.distribute(make_mesh(n_data=4, n_model=2))
    dev = meshed.evaluate(batches, metrics=want)
    for k in want:
        assert abs(dev[k] - host[k]) < 1e-5, (k, dev[k], host[k])


def test_cached_device_eval_ranked_matches_host(tmp_path):
    """Device-cache eval path computes MRR/NDCG on device, host parity."""
    import pandas as pd

    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.models.zoo.ranking import DNN

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=32, embedding_dim=4)
    fm.group_id = "C1"
    rng = np.random.default_rng(0)
    n = 512
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
    want = ["AUC", "MRR", "NDCG(k=5)", "logloss"]
    dev = m.evaluate(loader, metrics=want)
    m.kwargs["device_metrics"] = False
    host = m.evaluate(loader, metrics=want)
    for k in want:
        assert abs(dev[k] - host[k]) < 1e-6, (k, dev[k], host[k])


def test_multitask_mesh_device_eval_matches_host(tmp_path):
    """MultiTaskModel under a mesh computes per-task metrics from sharded
    device arrays (O(batch) host memory) with host parity — including
    grouped and ranked metrics."""
    from fuxictr_tpu.models import multitask as mt_mod
    from fuxictr_tpu.models.zoo.multitask_zoo import MMoE
    from fuxictr_tpu.parallel import make_mesh

    fm = make_synthetic_feature_map(num_categorical=4, num_numeric=2,
                                    vocab_size=64, embedding_dim=8)
    fm.labels = ["click", "conversion"]
    fm.group_id = "C1"
    batches = []
    for s in range(4):
        b = make_synthetic_batch(fm, 32, seed=s)
        rng = np.random.default_rng(100 + s)
        b["click"] = rng.integers(0, 2, 32).astype(np.float32)
        b["conversion"] = rng.integers(0, 2, 32).astype(np.float32)
        batches.append(b)

    def build(root):
        return MMoE(fm, model_id="MMoE_deveval", embedding_dim=8,
                    num_tasks=2,
                    task=["binary_classification", "binary_classification"],
                    num_experts=3, expert_hidden_units=(16,),
                    gate_hidden_units=(8,), tower_hidden_units=(8,),
                    model_root=str(root))

    want = ["AUC", "gAUC", "MRR", "NDCG(k=3)", "logloss"]
    single = build(tmp_path / "s")
    single.init_params()
    single.kwargs["device_metrics"] = False
    host = single.evaluate(batches, metrics=want)

    meshed = build(tmp_path / "m")
    meshed.distribute(make_mesh(n_data=4, n_model=2))

    called = {"stream": False}
    orig = mt_mod.MultiTaskModel._device_eval_streaming_multitask

    def spy(self, *a, **kw):
        called["stream"] = True
        return orig(self, *a, **kw)

    mt_mod.MultiTaskModel._device_eval_streaming_multitask = spy
    try:
        dev = meshed.evaluate(batches, metrics=want)
    finally:
        mt_mod.MultiTaskModel._device_eval_streaming_multitask = orig
    assert called["stream"], "mesh multitask eval should take device path"
    for k in host:
        assert abs(dev[k] - host[k]) < 1e-5, (k, dev[k], host[k])


def test_multitask_cached_device_eval_matches_host(tmp_path):
    """MultiTask + device-cache loader: per-task metrics computed fully on
    device match the host pass (incl. grouped)."""
    import pandas as pd

    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.models import multitask as mt_mod
    from fuxictr_tpu.models.zoo.multitask_zoo import MMoE

    fm = make_synthetic_feature_map(num_categorical=4, num_numeric=2,
                                    vocab_size=64, embedding_dim=8)
    fm.labels = ["click", "conversion"]
    fm.group_id = "C1"
    rng = np.random.default_rng(0)
    n = 512
    df = pd.DataFrame({name: (rng.integers(1, 64, n)
                              if spec["type"] == "categorical"
                              else rng.normal(size=n).astype(np.float32))
                       for name, spec in fm.features.items()})
    df["click"] = rng.integers(0, 2, n).astype(np.float32)
    df["conversion"] = rng.integers(0, 2, n).astype(np.float32)
    pq = tmp_path / "mtl.parquet"
    df.to_parquet(pq)
    loader = DeviceCacheDataLoader(fm, str(pq), batch_size=64,
                                   shuffle=False)
    m = MMoE(fm, model_id="MMoE_cachedev", embedding_dim=8, num_tasks=2,
             task=["binary_classification", "binary_classification"],
             num_experts=3, expert_hidden_units=(16,),
             gate_hidden_units=(8,), tower_hidden_units=(8,),
             model_root=str(tmp_path))
    m.init_params()

    called = {"dev": 0}
    orig = mt_mod.MultiTaskModel._device_eval_multitask

    def spy(self, *a, **kw):
        called["dev"] += 1
        return orig(self, *a, **kw)

    mt_mod.MultiTaskModel._device_eval_multitask = spy
    want = ["AUC", "gAUC", "logloss"]
    try:
        dev = m.evaluate(loader, metrics=want)
    finally:
        mt_mod.MultiTaskModel._device_eval_multitask = orig
    assert called["dev"] == 1, "cache eval should take the device path"

    m.kwargs["device_metrics"] = False
    host = m.evaluate(loader, metrics=want)
    for k in host:
        assert abs(dev[k] - host[k]) < 1e-6, (k, dev[k], host[k])
