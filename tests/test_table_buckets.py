"""Size-bucketed fused embedding tables (ops/embedding.py EmbeddingLayout).

The fused-table layout partitions each embedding-dim group into separate
tables by field vocab size (measured table-size gather/scatter physics —
BENCHMARKS.md, scripts/bench_table_split.py). These tests pin:

  * layout: bucket assignment, legacy naming when a dim has one bucket,
    share_embedding aliases following the owner's bucket,
  * numerics: bucketed forward == unbucketed forward with field-wise
    identical weights (any bucketing is a pure re-packing),
  * the stacked per-table gather path == the per-field path,
  * lazy-adam touched-rows traces keyed by bucketed param names.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fuxictr_tpu.ops.embedding import (DEFAULT_TABLE_SIZE_BUCKETS,
                                       EmbeddingLayout, FeatureEmbedding)
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)

VOCABS = [9000000, 200000, 50000, 9000, 3000, 40]   # spans all 3 buckets


def _fm(vocabs=VOCABS, **kw):
    return make_synthetic_feature_map(
        num_categorical=len(vocabs), num_numeric=2, vocab_size=vocabs,
        embedding_dim=4, **kw)


def test_layout_buckets_and_names():
    fm = _fm()
    lay = EmbeddingLayout(fm, 4)
    # vocabs 9M/200k -> big bucket; 50k -> mid; 9000 is > 8192 -> mid;
    # 3000/40 -> tiny. 3 buckets => b0/b1/b2 names.
    names = set(lay.tables)
    assert names == {"table_d4b0", "table_d4b1", "table_d4b2"}
    assert lay.tables["table_d4b2"]["rows"] == 9000000 + 200000
    assert lay.tables["table_d4b1"]["rows"] == 50000 + 9000
    assert lay.tables["table_d4b0"]["rows"] == 3000 + 40
    # offsets are per-bucket running sums in feature order
    assert lay.fields["C1"]["offset"] == 0          # 9M, big
    assert lay.fields["C2"]["offset"] == 9000000    # 200k, big
    assert lay.fields["C3"]["offset"] == 0          # 50k, mid
    assert lay.fields["C4"]["offset"] == 50000      # 9000, mid
    assert lay.fields["C5"]["offset"] == 0          # tiny
    assert lay.fields["C6"]["offset"] == 3000


def test_layout_single_bucket_keeps_legacy_name():
    fm = _fm(vocabs=[100, 50, 20])
    lay = EmbeddingLayout(fm, 4)
    assert set(lay.tables) == {"table_d4"}


def test_layout_disable_via_empty_buckets():
    fm = _fm()
    lay = EmbeddingLayout(fm, 4, size_buckets=())
    assert set(lay.tables) == {"table_d4"}
    assert lay.tables["table_d4"]["rows"] == sum(VOCABS)


def test_feature_map_attribute_plumbs_buckets():
    fm = _fm()
    fm.table_size_buckets = (1000,)
    lay = EmbeddingLayout(fm, 4)
    assert set(lay.tables) == {"table_d4b0", "table_d4b1"}
    assert lay.tables["table_d4b0"]["rows"] == 40
    # explicit arg wins over the feature_map attribute
    lay2 = EmbeddingLayout(fm, 4, size_buckets=())
    assert set(lay2.tables) == {"table_d4"}


def test_share_embedding_follows_owner_bucket():
    fm = _fm(vocabs=[500000, 30], num_sequence=1)   # S1 shares C1 (500k)
    lay = EmbeddingLayout(fm, 4)
    assert lay.fields["S1"]["table"] == lay.fields["C1"]["table"]
    assert lay.fields["S1"]["offset"] == lay.fields["C1"]["offset"]
    assert lay.fields["C2"]["table"] != lay.fields["C1"]["table"]


def _forward(fm, batch, size_buckets, params=None, collect_touched=False):
    emb = FeatureEmbedding(fm, embedding_dim=4, size_buckets=size_buckets)
    if params is None:
        variables = emb.init(jax.random.PRNGKey(0), batch)
    else:
        variables = {"params": params}
    if collect_touched:
        out, state = emb.apply(variables, batch, mutable=["touched_rows"])
        return out, variables["params"], state["touched_rows"]
    out = emb.apply(variables, batch)
    return out, variables["params"], None


def _repack(fm, params_from, lay_from, lay_to, params_to):
    """Copy per-field rows between two layouts' fused tables."""
    to_tabs = {k: np.array(v) for k, v in params_to.items()
               if k.startswith("table_d")}
    for name, plan in lay_from.fields.items():
        if "offset" not in plan:
            continue
        v = fm.features[name]["vocab_size"]
        src = np.asarray(params_from[plan["table"]])[
            plan["offset"]:plan["offset"] + v]
        dst_plan = lay_to.fields[name]
        to_tabs[dst_plan["table"]][
            dst_plan["offset"]:dst_plan["offset"] + v] = src
    out = dict(params_to)
    out.update({k: jnp.asarray(v) for k, v in to_tabs.items()})
    # numeric weights are layout-independent
    for k in params_from:
        if k.startswith("numeric_d"):
            out[k] = params_from[k]
    return out


@pytest.mark.parametrize("vocabs", [VOCABS, [500000, 30, 9000]])
def test_bucketed_forward_matches_fused(vocabs):
    fm = _fm(vocabs=vocabs)
    # keep ids tiny so the test never allocates a 9M-row table
    fm2_vocabs = [min(v, 4096) for v in vocabs]
    fm = _fm(vocabs=fm2_vocabs)
    fm.table_size_buckets = (100, 2000)   # force 2-3 buckets at tiny scale
    batch = make_synthetic_batch(fm, batch_size=64, seed=1)
    out_b, params_b, _ = _forward(fm, batch, None)
    lay_b = EmbeddingLayout(fm, 4)
    lay_f = EmbeddingLayout(fm, 4, size_buckets=())
    out_f0, params_f, _ = _forward(fm, batch, ())
    params_f2 = _repack(fm, params_b, lay_b, lay_f, params_f)
    out_f, _, _ = _forward(fm, batch, (), params=params_f2)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_f),
                               rtol=1e-6, atol=1e-6)


def test_grouped_gather_matches_per_field():
    """The stacked [B, F] per-table gather must equal per-field lookups:
    restricting each table to ONE field disables grouping."""
    fm = _fm(vocabs=[3000, 2500, 900, 800, 40])
    fm.table_size_buckets = (100, 1000)
    batch = make_synthetic_batch(fm, batch_size=32, seed=2)
    out_g, params, _ = _forward(fm, batch, None)
    # per-field: one bucket per field via per-field edges
    fm2 = _fm(vocabs=[3000, 2500, 900, 800, 40])
    fm2.table_size_buckets = (40, 800, 900, 2500, 3000)
    lay_g = EmbeddingLayout(fm, 4)
    lay_p = EmbeddingLayout(fm2, 4)
    out_p0, params_p, _ = _forward(fm2, batch, None)
    params_p2 = _repack(fm, params, lay_g, lay_p, params_p)
    out_p, _, _ = _forward(fm2, batch, None, params=params_p2)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_p),
                               rtol=1e-6, atol=1e-6)


def test_padding_mask_zeroes_rows_in_grouped_path():
    fm = _fm(vocabs=[3000, 2800])        # same bucket -> grouped gather
    batch = make_synthetic_batch(fm, batch_size=16, seed=3)
    batch["C1"] = np.zeros_like(batch["C1"])      # padding_idx = 0
    out, _, _ = _forward(fm, batch, None)
    # C1 is the first stacked field: its [B, D] slice must be zero
    np.testing.assert_array_equal(np.asarray(out[:, 2 + 0]), 0.0)


def test_touched_rows_keys_follow_bucketed_names():
    fm = _fm()
    fm2_vocabs = [min(v, 4096) for v in VOCABS]
    fm = _fm(vocabs=fm2_vocabs)
    fm.table_size_buckets = (100, 2000)
    batch = make_synthetic_batch(fm, batch_size=8, seed=4)
    _, params, touched = _forward(fm, batch, None, collect_touched=True)
    tabs = {k for k in params if k.startswith("table_d")}
    assert set(touched) <= tabs and len(touched) >= 2


def test_default_edges_are_sane():
    assert tuple(DEFAULT_TABLE_SIZE_BUCKETS) == \
        tuple(sorted(DEFAULT_TABLE_SIZE_BUCKETS))


def test_longctr_dedup_path_across_buckets():
    """LongCTR deduped batches: with bucketing, item_id (big vocab) and
    cate_id (small vocab) live in DIFFERENT tables, so the grouped
    multi-field expand degrades to per-table expands — outputs must equal
    the single-fused-table layout with field-wise identical weights."""
    from collections import OrderedDict

    from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
    from fuxictr_tpu.data.longctr_loader import (INVERSE_KEY, ITEMS_KEY,
                                                 SEQ_MASK_KEY)
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.registry import MODEL_REGISTRY
    import fuxictr_tpu.models.zoo  # noqa: F401

    B, L, V = 4, 6, 300

    def make_fm(buckets):
        fm = FeatureMap("buckets_longctr", "")
        fm.features = OrderedDict([
            ("user_feat", {"source": "user", "type": "categorical",
                           "padding_idx": 0, "vocab_size": 10}),
            ("item_id", {"source": "item", "type": "categorical",
                         "padding_idx": 0, "vocab_size": V}),
            ("cate_id", {"source": "item", "type": "categorical",
                         "padding_idx": 0, "vocab_size": 8}),
        ])
        fm.labels = ["clk"]
        fm.num_fields = fm.get_num_fields()
        fm.default_emb_dim = 8
        fm.set_column_index()
        fm.table_size_buckets = buckets
        return fm

    rng = np.random.default_rng(0)
    flat = rng.integers(1, V, B * (L + 1))
    uniq, inv = np.unique(flat, return_inverse=True)
    ids = np.zeros(32, np.int64)
    ids[:len(uniq)] = uniq
    batch = {
        "user_feat": rng.integers(1, 10, B).astype(np.int64),
        SEQ_MASK_KEY: np.ones((B, L), np.float32),
        "clk": rng.integers(0, 2, B).astype(np.float32),
        SAMPLE_MASK_KEY: np.ones(B, np.float32),
        ITEMS_KEY: {"item_id": ids, "cate_id": (ids % 7 + 1) * (ids > 0),
                    INVERSE_KEY: inv.astype(np.int32)},
    }

    def predict(buckets, emb_params=None):
        fm = make_fm(buckets)
        model = MODEL_REGISTRY["SIM"](
            fm, model_id="SIM_buckets", embedding_dim=8, attention_dim=8,
            dnn_hidden_units=(16,), topk=3, short_seq_len=2,
            model_root="/tmp/fuxictr_tpu_test")
        model._example_batch = lambda batch_size=2: batch
        model.init_params()
        lay = EmbeddingLayout(fm, 8)
        params = model.state.params
        if emb_params is not None:
            src_params, src_lay = emb_params
            emb = _repack(fm, src_params, src_lay, lay,
                          dict(params["embedding"]))
            params = dict(params)
            params["embedding"] = emb
            model.state = model.state.replace(params=params)
        y = model._make_predict_step()(model.state, jax.device_put(batch))
        return (np.asarray(y),
                {k: v for k, v in model.state.params["embedding"].items()},
                lay)

    y_b, emb_b, lay_b = predict((64,))        # item/user split from cate
    assert sum(k.startswith("table_d") for k in emb_b) == 2
    y_f, _, _ = predict((), emb_params=(emb_b, lay_b))
    np.testing.assert_allclose(y_b, y_f, rtol=2e-5, atol=2e-5)
