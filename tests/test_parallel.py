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
