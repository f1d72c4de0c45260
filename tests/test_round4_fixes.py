"""Regression tests for round-3 advisor findings: orbax tmp-dir debris in
the periodic-ckpt dir, resumed-run step numbering, legacy (pre-pin) serving
bundles, scoped rng_impl, device-metric exact-bound guard, and the
embedding-regularizer split on untraceable nets."""

import json
import os

import numpy as np
import pytest

from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)


def _dnn(fm, root, **kw):
    from fuxictr_tpu.models.zoo.ranking import DNN
    return DNN(fm, embedding_dim=4, hidden_units=(8,), model_root=str(root),
               reduce_lr_on_plateau=False, **kw)


def test_latest_checkpoint_ignores_orbax_tmp_dirs(tmp_path):
    """A crashed async save leaves step_<N>.orbax-checkpoint-tmp-<ts> next
    to the finished dirs; both latest_checkpoint() and the prune loop must
    skip (and sweep) it instead of raising ValueError on int()."""
    from fuxictr_tpu.models.base import RankModel
    root = tmp_path / "ckpt"
    for d in ("step_2", "step_10",
              "step_12.orbax-checkpoint-tmp-1718000000"):
        (root / d).mkdir(parents=True)
    got = RankModel.latest_checkpoint(str(root))
    assert got is not None and got.endswith("step_10")

    # the periodic-save path prunes without tripping over the tmp dir and
    # sweeps the debris
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=0,
                                    vocab_size=16, embedding_dim=4)
    m = _dnn(fm, tmp_path, periodic_ckpt=1, periodic_ckpt_keep=2)
    m.init_params()
    m._total_steps = 20

    # point the model at a pre-seeded periodic-ckpt dir with debris
    m.model_dir = str(tmp_path)
    m.model_id = "x"
    real_root = tmp_path / "x_ckpt"
    real_root.mkdir()
    for d in ("step_2", "step_4", "step_6",
              "step_8.orbax-checkpoint-tmp-1718000000"):
        (real_root / d).mkdir()
    m._evals_done = 0
    m._maybe_periodic_checkpoint()
    m._finish_periodic_checkpoint()
    left = sorted(os.listdir(real_root))
    assert "step_8.orbax-checkpoint-tmp-1718000000" not in left
    assert "step_20" in left
    assert "step_2" not in left          # pruned oldest


def test_resume_continues_step_numbering(tmp_path):
    """fit() after load_checkpoint must number periodic checkpoints from
    the restored optimizer step — not restart at step_1 (which rotation
    would then delete in favor of the stale pre-crash dirs)."""
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=1,
                                    vocab_size=16, embedding_dim=4)
    batches = [make_synthetic_batch(fm, 16, seed=s) for s in range(4)]
    m = _dnn(fm, tmp_path / "a", periodic_ckpt=1, eval_steps=2)
    m.fit(batches, epochs=1)             # 4 steps → ckpts at 2 and 4
    m._finish_periodic_checkpoint()
    latest = m.latest_checkpoint(m.periodic_ckpt_dir)
    assert latest.endswith("step_4")

    m2 = _dnn(fm, tmp_path / "a", periodic_ckpt=1, eval_steps=2)
    m2.load_checkpoint(latest, use_orbax=True)
    m2.fit(batches[:2], epochs=1)        # 2 more steps → ckpt at 6
    m2._finish_periodic_checkpoint()
    latest2 = m2.latest_checkpoint(m2.periodic_ckpt_dir)
    assert latest2.endswith("step_6"), latest2


def test_rng_impl_scoped_not_global():
    """rng_impl='rbg' must scope to the model's key lineage and leave the
    process-global jax_default_prng_impl untouched."""
    import jax
    before = jax.config.jax_default_prng_impl
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=0,
                                    vocab_size=16, embedding_dim=4)
    m = _dnn(fm, "/tmp/rng_scope_test", rng_impl="rbg")
    assert jax.config.jax_default_prng_impl == before
    # the model's own key really is rbg (typed key carrying its impl), it
    # survives split() (the crash mode of a raw impl-less key), and an
    # independently created default key is unaffected
    assert "rbg" in str(m._rng.dtype)
    a, b = jax.random.split(m._rng)
    assert "rbg" in str(a.dtype)
    jax.random.normal(b, (3,))           # usable for sampling
    plain = jax.random.PRNGKey(0)
    assert plain.shape == (2,)           # default threefry unchanged


def test_device_eval_guard_falls_back_to_host(tmp_path, monkeypatch):
    """An eval split larger than the int32-exact bound must take the host
    metrics path, not silently wrap the device rank accumulator."""
    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.models import base as base_mod

    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=1,
                                    vocab_size=16, embedding_dim=4)
    rng = np.random.default_rng(0)
    import pandas as pd
    n = 64
    df = pd.DataFrame({name: (rng.integers(1, 16, n)
                              if spec["type"] == "categorical"
                              else rng.normal(size=n).astype(np.float32))
                       for name, spec in fm.features.items()})
    df["label"] = rng.integers(0, 2, n).astype(np.float32)
    pq = tmp_path / "test.parquet"
    df.to_parquet(pq)
    loader = DeviceCacheDataLoader(fm, str(pq), batch_size=16,
                                   shuffle=False)
    m = _dnn(fm, tmp_path)
    m.init_params()
    logs_small = m.evaluate(loader, metrics=["AUC", "logloss"])

    called = {"device": False}
    orig = base_mod.RankModel._device_eval

    def spy(self, *a, **kw):
        called["device"] = True
        return orig(self, *a, **kw)

    monkeypatch.setattr(base_mod.RankModel, "_device_eval", spy)
    m.evaluate(loader, metrics=["AUC"])
    assert called["device"], "small split should use the device path"

    called["device"] = False
    monkeypatch.setattr(loader, "num_samples", 10 ** 9)
    logs_big = m.evaluate(loader, metrics=["AUC", "logloss"])
    assert not called["device"], "oversized split must fall back to host"
    assert logs_big["AUC"] == pytest.approx(logs_small["AUC"], abs=1e-6)


def test_reg_split_refuses_untraceable_net(tmp_path):
    """When module-path tracing fails AND the two regularizers differ, the
    reg split must fail loudly instead of silently name-guessing."""
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=0,
                                    vocab_size=16, embedding_dim=4)
    m = _dnn(fm, tmp_path, embedding_regularizer=1e-4,
             net_regularizer=1e-2)
    m.init_params()

    def broken(*a, **kw):
        raise RuntimeError("cannot trace")

    m.net.module_paths = broken
    with pytest.raises(RuntimeError, match="reg split"):
        m.regularization_loss(m.state.params)

    # equal regularizers: the split is irrelevant — fallback is fine
    m2 = _dnn(fm, tmp_path / "b", embedding_regularizer=1e-4,
              net_regularizer=1e-4)
    m2.init_params()
    m2.net.module_paths = broken
    float(m2.regularization_loss(m2.state.params))   # no raise


def test_legacy_bundle_without_layout_pin(tmp_path):
    """Bundles exported before the table-layout pin carry no
    table_size_buckets in model_meta.json; they were built with the legacy
    single-table layout, and the Predictor must default to that — not the
    current bucketed default (whose param names differ once vocabs span
    buckets)."""
    from fuxictr_tpu.serving import Predictor, export_model

    # vocabs spanning two default buckets: legacy vs bucketed layouts differ
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=0,
                                    vocab_size=[100, 20000],
                                    embedding_dim=4)
    m = _dnn(fm, tmp_path, table_size_buckets=[])    # legacy layout
    m.init_params()
    batch = make_synthetic_batch(fm, 8, seed=3)
    import jax
    want = np.asarray(m._make_predict_step()(
        m.state, jax.device_put(batch))).reshape(-1)

    bundle = export_model(m, str(tmp_path / "bundle"),
                          params=dict(model="DNN", embedding_dim=4,
                                      hidden_units=[8],
                                      table_size_buckets=[]))
    # simulate a pre-0.4.0 bundle: strip the pin
    meta_path = os.path.join(bundle, "model_meta.json")
    with open(meta_path) as fd:
        meta = json.load(fd)
    meta["params"].pop("table_size_buckets", None)
    with open(meta_path, "w") as fd:
        json.dump(meta, fd)

    pred = Predictor(bundle, batch_buckets=(8,), aot=False)
    feats = {k: v for k, v in batch.items()
             if k in fm.features}
    got = pred.predict(feats)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_remat_knob_numerics_identical(tmp_path):
    """remat: true (jax.checkpoint around the forward) must not change
    training numerics — only the backward's memory/recompute schedule."""
    import jax

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=32, embedding_dim=4)
    batches = [make_synthetic_batch(fm, 16, seed=s) for s in range(3)]
    plain = _dnn(fm, tmp_path / "p")
    plain.fit(batches, epochs=1)
    remat = _dnn(fm, tmp_path / "r", remat=True)
    remat.fit(batches, epochs=1)
    for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(plain.state.params)),
            jax.tree_util.tree_leaves(jax.device_get(remat.state.params))):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
