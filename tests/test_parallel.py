"""Sharded-training tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from fuxictr_tpu.parallel import make_mesh, shard_batch, shard_params
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)


def _model(vocab=512, dim=8, **kw):
    from fuxictr_tpu.models.zoo.ranking import DCNv2
    fm = make_synthetic_feature_map(num_categorical=6, num_numeric=3,
                                    vocab_size=vocab, embedding_dim=dim)
    return fm, DCNv2(fm, model_id="DCNv2_mesh", embedding_dim=dim,
                     model_structure="parallel",
                     stacked_dnn_hidden_units=[16],
                     parallel_dnn_hidden_units=[16],
                     num_cross_layers=2, model_root="/tmp/fx_mesh", **kw)


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=3, n_model=3)


def test_sharded_train_step_matches_single_device():
    fm, model = _model()
    model.init_params()
    single_params = jax.device_get(model.state.params)
    batch = make_synthetic_batch(fm, batch_size=32, seed=3)

    step = model._make_train_step()
    rng = jax.random.PRNGKey(7)
    s1, loss1 = step(model.state, jax.device_put(batch), rng)

    fm2, model2 = _model()
    model2.init_params()
    # identical init (same seed) — sanity-check before distributing
    np.testing.assert_allclose(
        jax.device_get(model2.state.params["embedding"]["table_d8"]),
        single_params["embedding"]["table_d8"])
    mesh = make_mesh(n_data=4, n_model=2)
    model2.distribute(mesh)
    step2 = model2._make_train_step()
    s2, loss2 = step2(model2.state, model2._place_batch(batch), rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        jax.device_get(s1.params["embedding"]["table_d8"]),
        jax.device_get(s2.params["embedding"]["table_d8"]), atol=1e-5)


def test_embedding_table_is_row_sharded():
    _, model = _model()
    model.init_params()
    mesh = make_mesh(n_data=4, n_model=2)
    model.distribute(mesh)
    table = model.state.params["embedding"]["table_d8"]
    spec = table.sharding.spec
    assert spec[0] == "model", f"expected row-sharded table, got {spec}"
    # optimizer moments inherit the same sharding
    leaves = jax.tree_util.tree_leaves(model.state.opt_state)
    shardings = {str(l.sharding.spec) for l in leaves
                 if hasattr(l, "sharding") and l.shape == table.shape}
    assert str(spec) in shardings


def test_shard_batch_places_on_data_axis():
    fm, _ = _model()
    mesh = make_mesh(n_data=8, n_model=1)
    batch = make_synthetic_batch(fm, batch_size=16, seed=0)
    placed = shard_batch(mesh, batch)
    for v in placed.values():
        assert v.sharding.spec[0] == "data"


def test_sharded_table_gather_matches_local():
    """shard_map all-to-all lookup == plain gather, on an 8-device mesh."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fuxictr_tpu.parallel.sharded_embedding import sharded_table_gather

    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 64, (16, 3)), jnp.int32)
    table_sharded = jax.device_put(
        table, NamedSharding(mesh, P("model", None)))
    ids_sharded = jax.device_put(
        ids, NamedSharding(mesh, P("data", None)))
    got = sharded_table_gather(mesh, table_sharded, ids_sharded)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(jnp.take(table, ids, axis=0)),
                               rtol=1e-6)
    # output stays batch-sharded
    assert got.sharding.spec[0] == "data"


def test_sharded_table_gather_grad():
    """Gradient of the shard_map lookup equals the dense scatter grad."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from fuxictr_tpu.parallel.sharded_embedding import sharded_table_gather

    mesh = make_mesh(n_data=4, n_model=2)
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 32, (16,)), jnp.int32)
    cot = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    ts = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    idx = jax.device_put(ids, NamedSharding(mesh, P("data")))

    g_sharded = jax.grad(
        lambda t: jnp.sum(sharded_table_gather(mesh, t, idx) * cot))(ts)
    g_ref = jax.grad(
        lambda t: jnp.sum(jnp.take(t, ids, axis=0) * cot))(table)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_longctr_dedup_train_step_distributes():
    """SIM with loader-deduped item batches on a (data x model) mesh:
    guards the table_gather_expand custom VJP under GSPMD (gather of a
    row-sharded table by replicated ids + two-stage scatter backward)."""
    from collections import OrderedDict

    from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
    from fuxictr_tpu.data.longctr_loader import (INVERSE_KEY, ITEMS_KEY,
                                                 SEQ_MASK_KEY)
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.registry import MODEL_REGISTRY
    import fuxictr_tpu.models.zoo  # noqa: F401

    B, L, V = 8, 6, 64
    fm = FeatureMap("syn_long_mesh", "")
    fm.features = OrderedDict([
        ("user_feat", {"source": "user", "type": "categorical",
                       "padding_idx": 0, "vocab_size": 12}),
        ("item_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": V}),
    ])
    fm.labels = ["clk"]
    fm.num_fields = fm.get_num_fields()
    fm.default_emb_dim = 8
    fm.set_column_index()
    rng = np.random.default_rng(0)
    flat = rng.integers(1, V, B * (L + 1))
    uniq, inv = np.unique(flat, return_inverse=True)
    cap = 64
    ids = np.zeros(cap, np.int64)
    ids[:len(uniq)] = uniq
    batch = {
        "user_feat": rng.integers(1, 12, B).astype(np.int64),
        SEQ_MASK_KEY: np.ones((B, L), np.float32),
        "clk": rng.integers(0, 2, B).astype(np.float32),
        SAMPLE_MASK_KEY: np.ones(B, np.float32),
        ITEMS_KEY: {"item_id": ids,
                    INVERSE_KEY: inv.astype(np.int32)},
    }

    def build():
        m = MODEL_REGISTRY["SIM"](
            fm, model_id="SIM_mesh", embedding_dim=8, attention_dim=8,
            dnn_hidden_units=(16,), topk=3, short_seq_len=2,
            model_root="/tmp/fx_mesh_longctr")
        m._example_batch = lambda batch_size=2: batch
        m.init_params()
        return m

    m1 = build()
    step1 = m1._make_train_step()
    s1, loss1 = step1(m1.state, jax.device_put(batch), jax.random.PRNGKey(1))

    m2 = build()
    mesh = make_mesh(n_data=4, n_model=2)
    m2.distribute(mesh)
    step2 = m2._make_train_step()
    s2, loss2 = step2(m2.state, m2._place_batch(batch), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        jax.device_get(s1.params["embedding"]["table_d8"]),
        jax.device_get(s2.params["embedding"]["table_d8"]), atol=1e-5)


def test_expert_parallel_mmoe_matches_single_device():
    """Stacked MMoE experts shard over the 'model' axis (EP) and the
    sharded step matches single-device numerics."""
    from fuxictr_tpu.models.zoo.multitask_zoo import MMoE
    from fuxictr_tpu.parallel.mesh import param_sharding

    def build():
        fm = make_synthetic_feature_map(num_categorical=6, num_numeric=3,
                                        vocab_size=512, embedding_dim=8)
        fm.labels = ["clk", "conv"]
        return fm, MMoE(fm, model_id="MMoE_mesh", embedding_dim=8,
                        num_tasks=2, num_experts=8,
                        task=["binary_classification"] * 2,
                        expert_hidden_units=(16,), gate_hidden_units=(8,),
                        tower_hidden_units=(8,), model_root="/tmp/fx_mesh")

    fm, model = build()
    model.init_params()
    batch = make_synthetic_batch(fm, batch_size=32, seed=5)
    rng = jax.random.PRNGKey(11)
    s1, loss1 = model._make_train_step()(
        model.state, jax.device_put(batch), rng)

    _, model2 = build()
    model2.init_params()
    mesh = make_mesh(n_data=4, n_model=2)
    model2.distribute(mesh)
    # the expert stack must actually be sharded on its expert axis
    ek = model2.state.params["experts"]["Dense_0"]["kernel"]
    assert ek.shape[0] == 8
    spec = ek.sharding.spec
    assert spec[0] == "model", spec
    s2, loss2 = model2._make_train_step()(
        model2.state, model2._place_batch(batch), rng)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        jax.device_get(s1.params["experts"]["Dense_0"]["kernel"]),
        jax.device_get(s2.params["experts"]["Dense_0"]["kernel"]),
        atol=1e-5)


def test_run_expid_use_mesh_end_to_end(tmp_path):
    """The user-facing mesh path: ``use_mesh: true`` through run_expid
    must build the (data x model) mesh, train GSPMD, stream evaluation
    from sharded device arrays, and report metrics equal to the
    single-device run of the same expid."""
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import run_expid

    base = load_config("./configs/tiny", "DNN_test")
    base.update(model_root=str(tmp_path), batch_size=32, verbose=0)

    plain = run_expid("./configs/tiny", "DNN_test", params=dict(base))
    meshed = run_expid("./configs/tiny", "DNN_test",
                       params=dict(base, use_mesh=True, mesh_model_axis=2))
    assert meshed["model"].mesh is not None
    assert dict(meshed["model"].mesh.shape) == {"data": 4, "model": 2}
    for k in plain["valid"]:
        assert abs(plain["valid"][k] - meshed["valid"][k]) < 1e-4, k


def test_run_expid_use_mesh_with_device_cache(tmp_path):
    """use_mesh + device_cache: HBM blocks are placed ON the model's mesh
    (the driver passes params['mesh']) and the device-epoch path runs."""
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import run_expid

    base = load_config("./configs/tiny", "DNN_test")
    base.update(model_root=str(tmp_path), batch_size=32, verbose=0,
                use_mesh=True, mesh_model_axis=2, device_cache=True,
                steps_per_call=2)
    out = run_expid("./configs/tiny", "DNN_test", params=base)
    assert np.isfinite(out["valid"]["AUC"])
    assert out["model"].mesh is not None
