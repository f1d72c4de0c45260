"""Device-resident dataset cache (fuxictr_tpu/data/device_cache.py):
batches reconstructed on-device from packed HBM blocks must be EXACTLY the
batches the in-memory loader yields, and training through the cache must
match in-memory training (identical shuffle stream by construction)."""

import numpy as np
import pytest

from fuxictr_tpu.config import load_config
from fuxictr_tpu.data import RankDataLoader
from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
from fuxictr_tpu.data.device_cache import (DeviceCacheDataLoader,
                                           expand_cached_batch)
from fuxictr_tpu.experiment import run_expid

CFG = "/root/repo/configs/tiny"


def _tiny_feature_map():
    from fuxictr_tpu.features import FeatureMap
    params = load_config(CFG, "DeepFM_test")
    fm = FeatureMap(params["dataset_id"], params["data_root"])
    import os
    fm.load(os.path.join(params["data_root"], params["dataset_id"],
                         "feature_map.json"), params)
    return fm, params


def test_cache_batches_match_inmemory():
    fm, params = _tiny_feature_map()
    data = params["train_data"]
    mem = RankDataLoader(fm, stage="test", test_data=data, batch_size=32,
                         shuffle=False, streaming=False,
                         data_format="parquet").make_iterator()
    cache = DeviceCacheDataLoader(fm, data, batch_size=32, shuffle=False)
    assert cache.num_samples == mem.num_samples
    assert len(cache) == len(mem)
    for mb, cb in zip(mem, cache):
        eb = expand_cached_batch(fm, cb)
        assert set(eb) == set(mb)
        valid = np.asarray(mb[SAMPLE_MASK_KEY]) > 0  # pad rows: mem zeros
        for k in mb:                                 # vs cache row-0 clamp
            got = np.asarray(eb[k]).reshape(np.asarray(mb[k]).shape)
            np.testing.assert_array_equal(
                got[valid], np.asarray(mb[k])[valid],
                err_msg=f"column {k} differs")


def test_cache_shuffle_stream_matches_inmemory():
    """Same seed => the cache loader and the in-memory loader emit the SAME
    shuffled row order (both use default_rng(seed+epoch))."""
    fm, params = _tiny_feature_map()
    data = params["train_data"]
    mem_iter = iter(
        RankDataLoader(fm, stage="test", test_data=data, batch_size=16,
                       shuffle=False, streaming=False,
                       data_format="parquet").make_iterator())
    fname = next(n for n, s in fm.features.items()
                 if s["type"] == "categorical")
    mem_rows = np.concatenate(
        [np.asarray(b[fname]) for b in mem_iter])
    cache = DeviceCacheDataLoader(fm, data, batch_size=16, shuffle=True,
                                  seed=7)
    got = []
    order = []
    for cb in cache:
        idx = cb["__rows__"]
        keep = idx >= 0
        order.append(idx[keep])
        eb = expand_cached_batch(fm, cb)
        got.append(np.asarray(eb[fname])[keep])
    order = np.concatenate(order)
    rng = np.random.default_rng(7)
    expect_order = np.arange(cache.num_samples, dtype=np.int32)
    rng.shuffle(expect_order)
    np.testing.assert_array_equal(order, expect_order)
    np.testing.assert_array_equal(np.concatenate(got), mem_rows[order])


def test_cache_mask_and_labels():
    fm, params = _tiny_feature_map()
    cache = DeviceCacheDataLoader(fm, params["train_data"], batch_size=64,
                                  shuffle=False)
    batches = list(cache)
    n = cache.num_samples
    masks = np.concatenate([b[SAMPLE_MASK_KEY] for b in batches])
    assert masks.sum() == n
    labels = np.concatenate([b["__labels__"] for b in batches])[:n, 0]
    mem = RankDataLoader(fm, stage="test", test_data=params["train_data"],
                         batch_size=64, shuffle=False, streaming=False,
                         data_format="parquet").make_iterator()
    mem_labels = np.concatenate(
        [np.asarray(b[fm.labels[0]])[np.asarray(b[SAMPLE_MASK_KEY]) > 0]
         for b in mem])
    np.testing.assert_array_equal(labels, mem_labels)


@pytest.mark.parametrize("expid", ["DeepFM_test", "DIN_test"])
def test_train_through_cache_matches_inmemory(expid, tmp_path):
    """run_expid with device_cache=True reproduces the in-memory run
    (same seed + same shuffle stream => same step sequence)."""
    params = load_config(CFG, expid)
    params.update(model_root=str(tmp_path / "mem"), epochs=1)
    ref = run_expid(CFG, expid, params=dict(params))
    params.update(model_root=str(tmp_path / "cache"), device_cache=True)
    got = run_expid(CFG, expid, params=dict(params))
    assert abs(ref["valid"]["AUC"] - got["valid"]["AUC"]) < 2e-3
    assert abs(ref["valid"]["logloss"] - got["valid"]["logloss"]) < 2e-3


def test_cache_scanned_multi_step(tmp_path):
    """steps_per_call>1 + device cache: blocks ride outside the lax.scan."""
    params = load_config(CFG, "DeepFM_test")
    params.update(model_root=str(tmp_path), device_cache=True,
                  steps_per_call=4, epochs=2)
    result = run_expid(CFG, "DeepFM_test", params=params)
    assert 0.0 < result["valid"]["AUC"] <= 1.0


def test_device_epoch_matches_inmemory_scanned(tmp_path):
    """steps_per_call>1 + device cache now runs whole epoch chunks on
    device (base.py:_train_epoch_device); same seed + same row stream must
    reproduce the in-memory scanned run."""
    params = load_config(CFG, "DeepFM_test")
    params.update(model_root=str(tmp_path / "mem"), epochs=2,
                  steps_per_call=4)
    ref = run_expid(CFG, "DeepFM_test", params=dict(params))
    params.update(model_root=str(tmp_path / "cache"), device_cache=True,
                  device_shuffle=False)   # numpy-exact row stream
    got = run_expid(CFG, "DeepFM_test", params=dict(params))
    assert abs(ref["valid"]["AUC"] - got["valid"]["AUC"]) < 2e-3
    assert abs(ref["valid"]["logloss"] - got["valid"]["logloss"]) < 2e-3


def test_device_shuffle_epoch_order_is_permutation():
    """device_shuffle=True: each epoch's on-device order covers every valid
    row exactly once, -1-pads the tail, and differs between epochs."""
    fm, params = _tiny_feature_map()
    cache = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                  shuffle=True, seed=3, device_shuffle=True)
    o1 = np.asarray(cache.epoch_order())
    o2 = np.asarray(cache.epoch_order())
    n = cache.num_samples
    for o in (o1, o2):
        assert len(o) == cache.num_batches * 16
        valid = o[o >= 0]
        assert sorted(valid) == list(range(n))
    assert not np.array_equal(o1, o2)


def test_cached_eval_matches_batch_loop():
    """The scanned device-cache evaluation path returns the same metrics as
    the per-batch in-memory loop for identical weights."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()
    seed_everything(2019)
    model = get_model("DNN")(fm, model_id="cache_eval", embedding_dim=4,
                             hidden_units=[8], batch_size=16,
                             model_root="/tmp/cache_eval")
    model.init_params()
    mem = RankDataLoader(fm, stage="test", test_data=params["train_data"],
                         batch_size=16, shuffle=False, streaming=False,
                         data_format="parquet").make_iterator()
    ref = model.evaluate(mem, metrics=["AUC", "logloss"])
    cache = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                  shuffle=False)
    got = model.evaluate(cache, metrics=["AUC", "logloss"])
    assert abs(ref["AUC"] - got["AUC"]) < 1e-6
    assert abs(ref["logloss"] - got["logloss"]) < 1e-6


def test_chunked_cache_eval_matches_resident():
    """hbm_limit_gb chunking: rotating super-chunks through the device
    yields exactly the same evaluation as the fully-resident cache."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()
    seed_everything(2019)
    model = get_model("DNN")(fm, model_id="chunk_eval", embedding_dim=4,
                             hidden_units=[8], batch_size=16,
                             model_root="/tmp/chunk_eval")
    model.init_params()
    resident = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                     shuffle=False)
    chunked = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                    shuffle=False, hbm_limit_gb=3e-6)
    assert chunked.chunked and len(chunked._chunk_bounds) >= 2
    assert chunked.num_batches == resident.num_batches
    ref = model.evaluate(resident, metrics=["AUC", "logloss"])
    got = model.evaluate(chunked, metrics=["AUC", "logloss"])
    assert abs(ref["AUC"] - got["AUC"]) < 1e-6
    assert abs(ref["logloss"] - got["logloss"]) < 1e-6


def test_chunked_cache_training_matches_resident(tmp_path):
    """shuffle=False + batch-aligned chunks => the chunked epoch replays
    the resident epoch's exact batch sequence; training must agree."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()

    def train(loader_kwargs, root):
        seed_everything(2019)
        model = get_model("DNN")(fm, model_id="chunk_fit", embedding_dim=4,
                                 hidden_units=[8], batch_size=16,
                                 steps_per_call=2, model_root=root)
        gen = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                    shuffle=False, **loader_kwargs)
        ev = DeviceCacheDataLoader(fm, params["valid_data"], batch_size=16,
                                   shuffle=False)
        model.fit(gen, validation_data=ev, epochs=2)
        return model.evaluate(ev, metrics=["AUC", "logloss"])

    ref = train({}, str(tmp_path / "res"))
    got = train({"hbm_limit_gb": 3e-6}, str(tmp_path / "chk"))
    assert abs(ref["AUC"] - got["AUC"]) < 1e-5
    assert abs(ref["logloss"] - got["logloss"]) < 1e-5


def test_chunked_cache_shuffled_fit(tmp_path):
    """Chunked cache with per-epoch chunk+row shuffling trains end-to-end
    (steps_per_call=1 also routes through the device-epoch driver)."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()
    seed_everything(2019)
    model = get_model("DNN")(fm, model_id="chunk_shuf", embedding_dim=4,
                             hidden_units=[8], batch_size=16,
                             model_root=str(tmp_path))
    gen = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                shuffle=True, seed=11, hbm_limit_gb=3e-6)
    ev = DeviceCacheDataLoader(fm, params["valid_data"], batch_size=16,
                               shuffle=False)
    model.fit(gen, validation_data=ev, epochs=2)
    logs = model.evaluate(ev, metrics=["AUC", "logloss"])
    assert 0.0 < logs["AUC"] <= 1.0 and np.isfinite(logs["logloss"])


def test_cache_on_mesh_cpu():
    """Replicated cache blocks + data-sharded index batches compile and run
    under a multi-device CPU mesh."""
    import jax
    from jax.sharding import Mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device CPU mesh")
    fm, params = _tiny_feature_map()
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2, 1),
                ("data", "model"))
    from fuxictr_tpu.models import get_model
    model = get_model("DNN")(fm, model_id="cache_mesh",
                             embedding_dim=4, hidden_units=[8],
                             batch_size=8, model_root="/tmp/cache_mesh")
    model.init_params()
    model.distribute(mesh)
    cache = DeviceCacheDataLoader(fm, params["train_data"], batch_size=8,
                                  shuffle=False, mesh=mesh)
    with mesh:
        model.fit(cache, validation_data=cache, epochs=1)
    assert np.isfinite(float(np.asarray(model.state.step)))


def test_device_epoch_on_mesh_cpu(tmp_path):
    """steps_per_call>1 + device cache + mesh: the on-device epoch runs
    under GSPMD (index windows sharded over the data axis against the
    replicated cache blocks) and matches the single-device device-epoch
    run."""
    import jax
    from jax.sharding import Mesh
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device CPU mesh")
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()

    def train(mesh, root):
        seed_everything(2019)
        model = get_model("DNN")(fm, model_id="mesh_epoch", embedding_dim=4,
                                 hidden_units=[8], batch_size=16,
                                 steps_per_call=3, model_root=root)
        model.init_params()
        if mesh is not None:
            model.distribute(mesh)
        gen = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                    shuffle=False, mesh=mesh)
        ev = DeviceCacheDataLoader(fm, params["valid_data"], batch_size=16,
                                   shuffle=False, mesh=mesh)
        if mesh is not None:
            with mesh:
                model.fit(gen, validation_data=ev, epochs=2)
        else:
            model.fit(gen, validation_data=ev, epochs=2)
        return model.evaluate(ev, metrics=["AUC", "logloss"])

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4, 1),
                ("data", "model"))
    ref = train(None, str(tmp_path / "single"))
    got = train(mesh, str(tmp_path / "mesh"))
    assert abs(ref["AUC"] - got["AUC"]) < 1e-4
    assert abs(ref["logloss"] - got["logloss"]) < 1e-4


def test_device_epoch_eval_steps_boundaries(tmp_path):
    """Mid-epoch eval_steps: the device-epoch driver splits scan calls at
    eval boundaries so evaluation happens exactly every eval_steps steps."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()
    seed_everything(2019)
    model = get_model("DNN")(fm, model_id="evalsteps", embedding_dim=4,
                             hidden_units=[8], batch_size=16,
                             steps_per_call=4, eval_steps=5,
                             model_root=str(tmp_path))
    gen = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                shuffle=False)       # 100 rows -> 7 batches
    ev = DeviceCacheDataLoader(fm, params["valid_data"], batch_size=16,
                               shuffle=False)
    eval_points = []
    orig = model.eval_step

    def spy():
        eval_points.append(model._total_steps)
        return orig()

    model.eval_step = spy
    model.fit(gen, validation_data=ev, epochs=2)
    # 7 batches/epoch, eval every 5 steps -> evals at total steps 5, 10
    assert eval_points == [5, 10]
    assert int(np.asarray(model.state.step)) == 14


def test_predict_routes_through_cache(tmp_path):
    """predict() uses the scanned cache path (chunked loaders would raise
    in per-batch iteration)."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()
    seed_everything(2019)
    model = get_model("DNN")(fm, model_id="cache_pred", embedding_dim=4,
                             hidden_units=[8], batch_size=16,
                             model_root=str(tmp_path))
    model.init_params()
    chunked = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                    shuffle=False, hbm_limit_gb=3e-6)
    y_chunked = model.predict(chunked)
    mem = RankDataLoader(fm, stage="test", test_data=params["train_data"],
                         batch_size=16, shuffle=False, streaming=False,
                         data_format="parquet").make_iterator()
    y_mem = model.predict(mem)
    np.testing.assert_allclose(y_chunked, y_mem, atol=1e-6)


def test_eval_steps_rederived_per_fit(tmp_path):
    """A second fit() with a different-sized dataset must not inherit the
    first fit's per-epoch eval_steps default."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()
    seed_everything(2019)
    model = get_model("DNN")(fm, model_id="evalsteps2", embedding_dim=4,
                             hidden_units=[8], batch_size=16,
                             model_root=str(tmp_path))
    big = DeviceCacheDataLoader(fm, params["train_data"], batch_size=8,
                                shuffle=False)    # 13 batches/epoch
    small = DeviceCacheDataLoader(fm, params["train_data"], batch_size=32,
                                  shuffle=False)  # 4 batches/epoch
    ev = DeviceCacheDataLoader(fm, params["valid_data"], batch_size=32,
                               shuffle=False)
    model.fit(big, validation_data=ev, epochs=1)
    assert model._eval_steps == 13
    model.fit(small, validation_data=ev, epochs=1)
    assert model._eval_steps == 4


def test_device_metrics_exact_vs_host():
    """The fully on-device eval (predictions never downloaded; exact
    integer-rank AUC) equals the host sklearn path bit-for-bit on AUC and
    to f32-reduction tolerance on logloss."""
    from fuxictr_tpu.models import get_model, seed_everything
    fm, params = _tiny_feature_map()
    seed_everything(2019)
    cache = DeviceCacheDataLoader(fm, params["train_data"], batch_size=16,
                                  shuffle=False)

    def build(**kw):
        m = get_model("DNN")(fm, model_id="devmet", embedding_dim=4,
                             hidden_units=[8], batch_size=16,
                             model_root="/tmp/devmet", **kw)
        seed_everything(7)
        m.init_params()
        return m

    host = build(device_metrics=False).evaluate(
        cache, metrics=["AUC", "logloss"])
    dev = build().evaluate(cache, metrics=["AUC", "logloss"])
    assert abs(host["AUC"] - dev["AUC"]) < 1e-12
    assert abs(host["logloss"] - dev["logloss"]) < 2e-6


def test_device_metrics_components_sklearn_parity():
    """device_metric_components: exact tie-averaged AUC + clipped logloss
    vs sklearn, under heavy ties, masking, and saturated predictions."""
    import jax
    import jax.numpy as jnp
    from sklearn.metrics import log_loss, roc_auc_score
    from fuxictr_tpu.metrics import (device_metric_components,
                                     finish_device_metrics)
    rng = np.random.default_rng(3)
    n = 50000
    s = np.round(rng.random(n), 2).astype(np.float32)   # heavy ties
    s[:10] = 0.0                                        # saturated
    s[10:20] = 1.0
    y = (rng.random(n) < 0.25).astype(np.float32)
    m = rng.random(n) < 0.8
    comps = jax.jit(device_metric_components)(
        jnp.asarray(s), jnp.asarray(y), jnp.asarray(m))
    out = finish_device_metrics(jax.device_get(comps), ["AUC", "logloss"])
    assert abs(out["AUC"] - roc_auc_score(y[m], s[m].astype(np.float64))) \
        < 1e-12
    assert abs(out["logloss"]
               - log_loss(y[m], s[m].astype(np.float64))) < 2e-6
    # single-class guard matches the host path's failure mode
    with pytest.raises(ValueError):
        finish_device_metrics(
            jax.device_get(jax.jit(device_metric_components)(
                jnp.asarray(s), jnp.ones(n, np.float32),
                jnp.asarray(m))), ["AUC"])


def test_narrow_staging_plan_and_repack():
    """Narrow-wire staging: columns pick the narrowest unsigned dtype
    their values fit, negatives force int32, and the on-device repack
    reproduces the canonical block exactly."""
    import jax
    import numpy as np

    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader

    ld = DeviceCacheDataLoader.__new__(DeviceCacheDataLoader)
    block = np.stack([
        np.arange(64) % 200,          # u8
        np.arange(64) * 500,          # u16 (max 31500)
        np.arange(64) * 100000,       # i32
        -np.arange(64),               # negative -> i32
    ], axis=1).astype(np.int32)
    ld._narrow = ld._plan_narrow(block)
    g = ld._narrow["groups"]
    assert g["u8"] == [0] and g["u16"] == [1] and sorted(g["i32"]) == [2, 3]
    out = np.asarray(ld._put_int_block(block, None))
    np.testing.assert_array_equal(out, block)

    # all-wide block: plan is None and staging is a plain device_put
    wide = (np.arange(64).reshape(-1, 1) * 10 ** 6).astype(np.int32)
    assert ld._plan_narrow(wide) is None
    ld._narrow = None
    np.testing.assert_array_equal(np.asarray(ld._put_int_block(wide, None)),
                                  wide)


def test_float_staging_optin_halves_wire_precision():
    """float_staging='float16' ships the float block narrow and widens on
    device: values within f16 rounding, labels (0/1) exact; default path
    stays bit-exact."""
    import numpy as np

    fm, params = _tiny_feature_map()
    data = params["train_data"]
    exact = DeviceCacheDataLoader(fm, data, batch_size=32, shuffle=False)
    lossy = DeviceCacheDataLoader(fm, data, batch_size=32, shuffle=False,
                                  float_staging="float16")
    fe = np.asarray(exact.cache_refs()["__cache_float__"])
    fl = np.asarray(lossy.cache_refs()["__cache_float__"])
    assert fl.dtype == np.float32                 # widened on device
    np.testing.assert_allclose(fl, fe, rtol=1e-3, atol=1e-4)
    # labels column is exact (0/1 representable in f16)
    from fuxictr_tpu.data.device_cache import cache_layout
    layout, _, _ = cache_layout(fm)
    for lb in fm.labels:
        _, lo, _, _ = layout[lb]
        np.testing.assert_array_equal(fl[:, lo], fe[:, lo])
