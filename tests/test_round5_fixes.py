"""Regression tests for round-4 advisor findings: warm-tuner loader cache
keyed on float_staging, pre-pin serving bundles built with the bucketed
layout, the device-grouped sentinel group id, and the fail-open
num_samples gate — plus the round-5 vocab-slice sequence gather parity.
"""

import numpy as np
import pytest

from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)


def test_loader_cache_key_includes_float_staging():
    """Two expids differing only in float_staging must NOT reuse the same
    staged loader (ADVICE r4 #1)."""
    from fuxictr_tpu.experiment import _LOADER_KEYS
    assert "float_staging" in _LOADER_KEYS


def test_unpinned_bucketed_bundle_layout_is_inferred(tmp_path):
    """A bundle exported in the window where bucketing was the default but
    export did not yet pin table_size_buckets must restore with the
    bucketed layout, inferred from the saved param names (ADVICE r4 #2)."""
    import json
    import os

    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.serving import export_model
    from fuxictr_tpu.serving.predictor import Predictor, _infer_table_buckets

    # vocabs spanning two default buckets -> split tables table_d4b0/b1
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=0,
                                    vocab_size=[16384, 1024, 512],
                                    embedding_dim=4)
    model = DNN(fm, embedding_dim=4, hidden_units=(8,),
                model_root=str(tmp_path))
    model.init_params()
    tables = [k for k in model.state.params["embedding"]
              if k.startswith("table_d")]
    assert any("b" in t.split("table_d4")[-1] for t in tables), tables

    export_dir = str(tmp_path / "bundle")
    export_model(model, export_dir,
                 params=dict(model="DNN", embedding_dim=4,
                             hidden_units=[8]))
    # simulate the pre-pin exporter: drop the pinned layout from meta
    meta_path = os.path.join(export_dir, "model_meta.json")
    with open(meta_path) as fd:
        meta = json.load(fd)
    meta["params"].pop("table_size_buckets")
    with open(meta_path, "w") as fd:
        json.dump(meta, fd)

    pred = Predictor(export_dir, batch_buckets=(4,), aot=False)
    got = [k for k in pred.model.state.params["embedding"]
           if k.startswith("table_d")]
    assert sorted(got) == sorted(tables)

    # and a genuinely legacy tree (no b-suffixed tables) infers []
    assert _infer_table_buckets({"embedding": {"table_d4": 0}}) == []


def test_device_grouped_handles_int32max_group_id():
    """A real group id of 2**31-1 must not merge with padded rows
    (ADVICE r4 #3): mask is the primary sort key and a segment boundary."""
    import jax.numpy as jnp

    from fuxictr_tpu.metrics import (device_grouped_components,
                                     finish_device_grouped, grouped_metrics)

    rng = np.random.default_rng(0)
    n = 64
    scores = rng.random(n).astype(np.float32)
    labels = (rng.random(n) < 0.4).astype(np.float32)
    groups = rng.integers(0, 3, n).astype(np.int64)
    sentinel = np.iinfo(np.int32).max
    groups[:20] = sentinel          # a REAL group at the sentinel value
    labels[:20] = ([0, 1] * 10)     # mixed labels -> it is a valid group
    mask = np.ones(n, bool)
    mask[-8:] = False               # padded tail with garbage everything
    scores[-8:] = 0.5
    labels[-8:] = 1.0
    groups[-8:] = sentinel          # padded rows share the sentinel id

    comps = device_grouped_components(
        jnp.asarray(scores), jnp.asarray(labels),
        jnp.asarray(groups.astype(np.int32)), jnp.asarray(mask))
    got = finish_device_grouped(comps, ["gAUC", "avgAUC"])

    expect = grouped_metrics(
        labels[mask].astype(np.float64), scores[mask].astype(np.float64),
        groups[mask], ["gAUC", "avgAUC"])
    np.testing.assert_allclose(got["gAUC"], expect["gAUC"], atol=1e-6)
    np.testing.assert_allclose(got["avgAUC"], expect["avgAUC"], atol=1e-6)


def test_device_metrics_gate_fails_closed_without_num_samples(tmp_path,
                                                              monkeypatch):
    """A cache_refs-bearing loader lacking num_samples must take the host
    path, not default to 0 and pass the int32-exactness gate
    (ADVICE r4 #4)."""
    import fuxictr_tpu.models.base as base_mod

    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=0,
                                    vocab_size=16, embedding_dim=4)
    from fuxictr_tpu.models.zoo.ranking import DNN
    model = DNN(fm, embedding_dim=4, hidden_units=(8,),
                model_root=str(tmp_path))
    model.init_params()

    calls = {"device": 0}

    def boom(self, *a, **k):
        calls["device"] += 1
        raise AssertionError("device path must not run")

    monkeypatch.setattr(type(model), "_device_eval", boom, raising=True)

    class NoNumSamples:
        """Quacks like a device-cache loader but exposes no num_samples."""
        cache_refs = ()

        def __init__(self, fm):
            batch = make_synthetic_batch(fm, batch_size=8, seed=1)
            self._batch = batch

        def __iter__(self):
            from fuxictr_tpu.models.base import SAMPLE_MASK_KEY
            b = dict(self._batch)
            b[SAMPLE_MASK_KEY] = np.ones(8, np.float32)
            return iter([b])

    loader = NoNumSamples(fm)
    # host path must also not take the _cached_predictions branch (no real
    # cache blocks) — the fallback generic loop handles it
    try:
        logs = model.evaluate(loader, metrics=["AUC", "logloss"])
        assert np.isfinite(logs["logloss"])
    except AttributeError:
        # acceptable: the fake loader lacks the rest of the cache-loader
        # surface; what matters is the device gate did not fire
        pass
    assert calls["device"] == 0


def test_seq_slice_gather_parity():
    """Vocab-slice sequence gather (VERDICT r4 #2) is numerically identical
    to the direct big-table gather, forward and backward."""
    import jax

    from fuxictr_tpu.models.zoo.sequence import DIN

    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=1,
                                    vocab_size=64, num_sequence=1,
                                    seq_len=6, embedding_dim=8)
    batch = make_synthetic_batch(fm, batch_size=32, seed=0)
    results = []
    for knob in (True, False):
        m = DIN(fm, model_id=f"DIN_slice_{knob}", embedding_dim=8,
                dnn_hidden_units=[16], attention_hidden_units=[8],
                din_target_field="C1", din_sequence_field="S1",
                seq_slice_gather=knob, model_root="/tmp/fx_slice")
        m.init_params()
        step = m._make_train_step()
        s, loss = step(m.state, jax.device_put(batch), jax.random.PRNGKey(1))
        results.append((float(loss),
                        jax.device_get(s.params["embedding"]["table_d8"])))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1],
                               rtol=1e-5, atol=1e-7)


def test_resume_align_data_exact_parity(tmp_path):
    """resume_align_data: a crash-restore mid-epoch-2 consumes the EXACT
    remaining data stream — with dropout off, the resumed run's final
    params are bit-identical to the uninterrupted run's."""
    import os

    import jax
    import pandas as pd

    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.models.zoo.ranking import DNN

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=32, embedding_dim=4)
    rng = np.random.default_rng(0)
    n = 32
    df = pd.DataFrame({name: (rng.integers(1, 32, n)
                              if spec["type"] == "categorical"
                              else rng.normal(size=n).astype(np.float32))
                       for name, spec in fm.features.items()})
    df["label"] = rng.integers(0, 2, n).astype(np.float32)
    pq = tmp_path / "train.parquet"
    df.to_parquet(pq)

    def build(root, **kw):
        m = DNN(fm, embedding_dim=4, hidden_units=(8,), batch_norm=False,
                model_root=str(root), steps_per_call=1, eval_steps=2,
                periodic_ckpt=1, periodic_ckpt_keep=10,
                reduce_lr_on_plateau=False, **kw)
        loader = DeviceCacheDataLoader(fm, str(pq), batch_size=8,
                                       shuffle=True, seed=7)
        return m, loader            # 4 steps/epoch, ckpt every 2 steps

    # uninterrupted 2-epoch run; its periodic ckpts double as the
    # "crashed run's" checkpoints (identical by determinism)
    a, loader_a = build(tmp_path / "a")
    a.fit(loader_a, validation_data=loader_a, epochs=2)
    ref = jax.device_get(a.state.params)
    ck6 = os.path.join(str(tmp_path / "a"), fm.dataset_id,
                       a.model_id + "_ckpt", "step_6")
    assert os.path.isdir(ck6), os.listdir(os.path.dirname(ck6))

    # "crash" at step 6 (mid-epoch-2): restore + aligned resume of the
    # remaining 2 batches of epoch 2
    b, loader_b = build(tmp_path / "b", resume_align_data=True)
    b.init_params()
    b.load_checkpoint(ck6, use_orbax=True)
    b.fit(loader_b, validation_data=loader_b, epochs=1)
    got = jax.device_get(b.state.params)

    for x, y in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(x, y, rtol=0, atol=0)
