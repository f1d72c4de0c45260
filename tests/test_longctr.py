"""LongCTR subsystem tests: side-table loader + SIM/ETA/SDIM/TWIN/MIRRN
end-to-end on a synthetic dataset with parquet side tables."""

from collections import OrderedDict

import jax
import numpy as np
import pandas as pd
import pytest

from fuxictr_tpu.data.longctr_loader import (ITEMS_KEY, SEQ_MASK_KEY,
                                             LongCTRDataLoader)
from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models.registry import MODEL_REGISTRY

import fuxictr_tpu.models.zoo  # noqa: F401

N_USERS, N_ITEMS, N_CATES = 20, 50, 8
MAX_LEN = 12


@pytest.fixture(scope="module")
def longctr_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("longctr")
    rng = np.random.default_rng(0)
    # user side table: full item sequences (variable length)
    user_seqs = [rng.integers(1, N_ITEMS, rng.integers(1, 40)).tolist()
                 for _ in range(N_USERS)]
    pd.DataFrame({"full_item_seq": user_seqs}).to_parquet(
        root / "user_info.parquet")
    # item side table: per-item features, indexed 0..N_ITEMS-1 (0 = pad)
    pd.DataFrame({
        "item_index": np.arange(N_ITEMS),
        "item_id": np.arange(N_ITEMS),
        "cate_id": np.concatenate([[0], rng.integers(1, N_CATES,
                                                     N_ITEMS - 1)]),
    }).to_parquet(root / "item_info.parquet")
    # interaction file
    n = 64
    users = rng.integers(0, N_USERS, n)
    pd.DataFrame({
        "user_index": users,
        "seq_len": [min(len(user_seqs[u]), 40) for u in users],
        "item_index": rng.integers(1, N_ITEMS, n),
        "user_feat": rng.integers(1, 10, n),
        "clk": rng.integers(0, 2, n).astype(np.float32),
    }).to_parquet(root / "train.parquet")

    fm = FeatureMap("synthetic_longctr", data_dir=str(root))
    fm.features = OrderedDict([
        ("user_feat", {"source": "user", "type": "categorical",
                       "padding_idx": 0, "vocab_size": 10}),
        ("item_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": N_ITEMS}),
        ("cate_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": N_CATES}),
    ])
    fm.labels = ["clk"]
    fm.num_fields = fm.get_num_fields()
    fm.default_emb_dim = 8
    fm.set_column_index()
    return fm, root


def _loader(fm, root, batch_size=16):
    return LongCTRDataLoader(fm, str(root / "train.parquet"),
                             batch_size=batch_size, shuffle=False,
                             user_info=str(root / "user_info.parquet"),
                             item_info=str(root / "item_info.parquet"),
                             max_len=MAX_LEN)


def test_loader_batch_shapes(longctr_data):
    fm, root = longctr_data
    loader = _loader(fm, root)
    batches = list(loader)
    assert len(batches) == len(loader) == 4
    b = batches[0]
    assert b[SEQ_MASK_KEY].shape == (16, MAX_LEN)
    assert b[ITEMS_KEY]["item_id"].shape == (16 * (MAX_LEN + 1),)
    # pre-padding: masks are trailing-true
    m = b[SEQ_MASK_KEY]
    for row in m:
        nz = np.nonzero(row)[0]
        if len(nz):
            assert (row[nz[0]:] == 1).all()
    # dedup layout: unique rows + inverse reconstructs the flat layout;
    # target item occupies the last slot of each item row
    from fuxictr_tpu.data.longctr_loader import INVERSE_KEY
    inv = b[ITEMS_KEY][INVERSE_KEY]
    items = b[ITEMS_KEY]["item_id"][inv].reshape(16, MAX_LEN + 1)
    np.testing.assert_array_equal(items[:, -1], b["item_index"][:16])
    # unique ids really are unique (ignoring the 0-padding tail)
    uniq = b[ITEMS_KEY]["item_id"]
    nz = uniq[uniq > 0]
    assert len(np.unique(nz)) == len(nz)


def test_loader_dedup_parity(longctr_data):
    """dedup_items=True must be a pure layout change: identical model
    predictions to the duplicated layout."""
    from fuxictr_tpu.data.longctr_loader import INVERSE_KEY
    fm, root = longctr_data
    b_dedup = next(iter(_loader(fm, root)))
    loader_plain = LongCTRDataLoader(
        fm, str(root / "train.parquet"), batch_size=16, shuffle=False,
        user_info=str(root / "user_info.parquet"),
        item_info=str(root / "item_info.parquet"), max_len=MAX_LEN,
        dedup_items=False)
    b_plain = next(iter(loader_plain))
    assert INVERSE_KEY not in b_plain[ITEMS_KEY]
    inv = b_dedup[ITEMS_KEY][INVERSE_KEY]
    for col in b_plain[ITEMS_KEY]:
        np.testing.assert_array_equal(
            b_dedup[ITEMS_KEY][col][inv], b_plain[ITEMS_KEY][col])
    model = MODEL_REGISTRY["SIM"](
        fm, model_id="SIM_dedup", embedding_dim=8, attention_dim=8,
        dnn_hidden_units=(16,), topk=5, short_seq_len=4,
        model_root="/tmp/fx_longctr")
    model._example_batch = lambda batch_size=2: b_dedup
    model.init_params()
    predict = model._make_predict_step()
    y1 = np.asarray(predict(model.state, jax.device_put(b_dedup)))
    y2 = np.asarray(predict(model.state, jax.device_put(b_plain)))
    np.testing.assert_allclose(y1, y2, rtol=1e-5, atol=1e-6)


def test_loader_pads_last_batch(longctr_data):
    fm, root = longctr_data
    loader = _loader(fm, root, batch_size=24)  # 64 = 2*24 + 16
    batches = list(loader)
    last = batches[-1]
    assert last[SEQ_MASK_KEY].shape == (24, MAX_LEN)
    assert last["__mask__"].sum() == 16


@pytest.mark.parametrize("name,kw", [
    ("SIM", dict(topk=5, short_seq_len=4)),
    ("SIM", dict(topk=5, short_seq_len=4, gsu_type="hard")),
    ("SIM", dict(topk=5, short_seq_len=4, gsu_type="hard",
                 product_pooling=True)),
    ("SIM", dict(topk=5, short_seq_len=4, product_pooling=True)),
    ("ETA", dict(topk=5, short_seq_len=4, hash_bits=8)),
    ("ETA", dict(topk=5, short_seq_len=4, hash_bits=8,
                 product_pooling=True)),
    ("SDIM", dict(short_seq_len=4, num_hashes=2, hash_bits=3)),
    ("SDIM", dict(short_seq_len=4, num_hashes=2, hash_bits=3,
                  product_pooling=True)),
    ("TWIN", dict(topk=5, short_seq_len=4)),
    ("TWIN", dict(topk=5, short_seq_len=4, Kc_cross_features=1)),
    ("TWIN", dict(topk=5, short_seq_len=4, product_pooling=True)),
    ("MIRRN", dict(topk=5, short_seq_len=4, hash_bits=8, max_len=50)),
    ("MIRRN", dict(topk=5, short_seq_len=4, hash_bits=8, max_len=50,
                   product_pooling=True)),
])
def test_longctr_model_trains(name, kw, longctr_data):
    fm, root = longctr_data
    model = MODEL_REGISTRY[name](
        fm, model_id=f"{name}_smoke", embedding_dim=8, attention_dim=8,
        dnn_hidden_units=(16,), model_root="/tmp/fx_longctr", **kw)
    loader = _loader(fm, root)
    batch = next(iter(loader))
    model._example_batch = lambda batch_size=2: batch  # init on real batch
    model.init_params()
    step = model._make_train_step()
    state, loss = step(model.state, jax.device_put(batch),
                       jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)), name
    y = model._make_predict_step()(state, jax.device_put(batch))
    assert np.asarray(y).shape[0] == 16


def _craft_batch(hist_items, hist_cates, tgt_item, tgt_cate):
    """Hand-built LongCTR batch: B=1, L=len(hist_items)."""
    L = len(hist_items)
    items = {
        "item_id": np.array(hist_items + [tgt_item], np.int64),
        "cate_id": np.array(hist_cates + [tgt_cate], np.int64),
    }
    return {
        "user_feat": np.array([1], np.int64),
        "clk": np.array([1.0], np.float32),
        SEQ_MASK_KEY: np.ones((1, L), np.float32),
        ITEMS_KEY: items,
        "__mask__": np.ones(1, np.float32),
    }


def test_sim_hard_gsu_ignores_nonmatching_history(longctr_data):
    """Hard search must make y_pred invariant to history events whose
    category does not match the target (outside the short window); soft
    search attends them and must NOT be invariant."""
    fm, _ = longctr_data
    # short window = last short_seq_len-1 = 1 event (kept identical);
    # the first 3 events share cate 2 != target cate 3 and differ in ids
    a = _craft_batch([5, 6, 7, 9], [2, 2, 2, 2], 3, 3)
    b = _craft_batch([10, 11, 12, 9], [2, 2, 2, 2], 3, 3)
    # c swaps a non-short-window event to the target's category: the
    # matched set becomes non-empty, so hard-mode output MUST move
    # (guards against the invariance passing vacuously)
    c = _craft_batch([5, 6, 7, 9], [3, 2, 2, 2], 3, 3)
    model = MODEL_REGISTRY["SIM"](
        fm, model_id="SIM_hard_inv", embedding_dim=8, attention_dim=8,
        dnn_hidden_units=(16,), topk=3, short_seq_len=2, gsu_type="hard",
        product_pooling=True, model_root="/tmp/fx_longctr")
    model._example_batch = lambda batch_size=1: a
    model.init_params()
    predict = model._make_predict_step()
    ya = np.asarray(predict(model.state, jax.device_put(a)))
    yb = np.asarray(predict(model.state, jax.device_put(b)))
    yc = np.asarray(predict(model.state, jax.device_put(c)))
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-6)
    assert not np.allclose(ya, yc, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name,kw", [
    ("SIM", dict(topk=3, gsu_type="hard")),
    ("ETA", dict(topk=3, hash_bits=8)),
    ("SDIM", dict(num_hashes=2, hash_bits=3)),
    ("TWIN", dict(topk=3)),
    ("MIRRN", dict(topk=3, hash_bits=8, max_len=50)),
])
def test_product_pooling_sees_exact_repeat(name, kw, longctr_data):
    """The exact-item match count must change y_pred when the target
    appears in the (otherwise identical) history — family-wide
    product_pooling extension."""
    fm, _ = longctr_data
    a = _craft_batch([5, 6, 7, 9], [3, 2, 2, 2], 3, 3)   # no repeat
    b = _craft_batch([3, 6, 7, 9], [3, 2, 2, 2], 3, 3)   # repeat at pos 0
    model = MODEL_REGISTRY[name](
        fm, model_id=f"{name}_pp_repeat", embedding_dim=8, attention_dim=8,
        dnn_hidden_units=(16,), short_seq_len=2,
        product_pooling=True, model_root="/tmp/fx_longctr", **kw)
    model._example_batch = lambda batch_size=1: a
    model.init_params()
    predict = model._make_predict_step()
    ya = np.asarray(predict(model.state, jax.device_put(a)))
    yb = np.asarray(predict(model.state, jax.device_put(b)))
    assert not np.allclose(ya, yb, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["LongDIN", "LongDIEN", "LongDCNv2",
                                  "LongFinalMLP", "LongTransAct"])
def test_long_variant_trains(name, longctr_data):
    fm, root = longctr_data
    kw = {}
    if name == "LongTransAct":
        kw = dict(dim_feedforward=16, dcn_hidden_units=(16,))
    model = MODEL_REGISTRY[name](
        fm, model_id=f"{name}_smoke", embedding_dim=8,
        dnn_hidden_units=(16,)
        if name in ("LongDIN", "LongDIEN") else (16,),
        model_root="/tmp/fx_longctr", **kw)
    loader = _loader(fm, root)
    batch = next(iter(loader))
    model._example_batch = lambda batch_size=2: batch
    model.init_params()
    state, loss = model._make_train_step()(model.state, jax.device_put(batch),
                                           jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)), name


def test_device_cache_loader_matches_host_join(longctr_data):
    """LongCTRDeviceCacheLoader's on-device join reproduces the host
    loader's batches exactly (windowing, masks, item features, labels)."""
    from fuxictr_tpu.data.device_cache import ROWS_KEY
    from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
    from fuxictr_tpu.data.longctr_loader import LongCTRDeviceCacheLoader

    fm, root = longctr_data
    host = LongCTRDataLoader(fm, str(root / "train.parquet"),
                             batch_size=16, shuffle=False,
                             user_info=str(root / "user_info.parquet"),
                             item_info=str(root / "item_info.parquet"),
                             max_len=MAX_LEN, dedup_items=False)
    dev = LongCTRDeviceCacheLoader(
        fm, str(root / "train.parquet"), batch_size=16, shuffle=False,
        user_info=str(root / "user_info.parquet"),
        item_info=str(root / "item_info.parquet"), max_len=MAX_LEN)
    expand = dev.cache_expander
    refs = dev.cache_refs()
    B = 16
    for bi, hb in enumerate(host):
        idx = np.arange(bi * B, (bi + 1) * B, dtype=np.int32)
        mask = (idx < dev.num_samples).astype(np.float32)
        idx = np.where(mask > 0, idx, -1).astype(np.int32)
        batch = dict(refs)
        batch[ROWS_KEY] = idx
        batch[SAMPLE_MASK_KEY] = mask
        out = jax.jit(expand)(batch)
        np.testing.assert_array_equal(
            np.asarray(out[SEQ_MASK_KEY]) * np.asarray(mask)[:, None],
            np.asarray(hb[SEQ_MASK_KEY]) * hb[SAMPLE_MASK_KEY][:, None])
        vm = np.repeat(mask, MAX_LEN + 1) > 0
        for col in ("item_id", "cate_id"):
            np.testing.assert_array_equal(
                np.asarray(out[ITEMS_KEY][col])[vm],
                np.asarray(hb[ITEMS_KEY][col])[vm])
        np.testing.assert_array_equal(
            np.asarray(out["user_feat"])[mask > 0],
            hb["user_feat"][hb[SAMPLE_MASK_KEY] > 0])
        np.testing.assert_allclose(
            np.asarray(out["clk"])[mask > 0],
            hb["clk"][hb[SAMPLE_MASK_KEY] > 0])
        np.testing.assert_array_equal(np.asarray(out[SAMPLE_MASK_KEY]), mask)


def test_longctr_device_cache_fit_and_eval(longctr_data):
    """SIM trains + evaluates through the device-resident LongCTR cache
    (facade-selected via device_cache=True) and matches the host-join
    loader's loss trajectory on the same rows."""
    from fuxictr_tpu.data import RankDataLoader

    fm, root = longctr_data
    common = dict(
        train_data=str(root / "train.parquet"),
        valid_data=str(root / "train.parquet"),
        user_info=str(root / "user_info.parquet"),
        item_info=str(root / "item_info.parquet"),
        max_len=MAX_LEN, batch_size=16, shuffle=False,
        data_loader=LongCTRDataLoader)

    def run(device_cache):
        model = MODEL_REGISTRY["SIM"](
            fm, embedding_dim=8, attention_dim=8, dnn_hidden_units=[16],
            topk=4, short_seq_len=4, model_root="/tmp/fx_longctr_dc",
            seed=2019, epochs=1)
        train_gen, valid_gen = RankDataLoader(
            fm, stage="train", device_cache=device_cache,
            **common).make_iterator()
        model.fit(train_gen, validation_data=valid_gen, epochs=1)
        return model.evaluate(valid_gen)

    host_logs = run(False)
    dev_logs = run(True)
    assert abs(host_logs["AUC"] - dev_logs["AUC"]) < 2e-3, (
        host_logs, dev_logs)
