"""Born-sharded init/restore: no device ever materializes a full table.

The reference is single-device only (torch_utils.py:42-56) and could not
train a table beyond one device's memory. Attaching the mesh BEFORE init
makes `net.init` run as one jitted program with out_shardings, so each
table shard is created directly on its own device — max trainable vocab
scales with aggregate slice HBM (models/base.py:init_params).
"""

import os

import jax
import numpy as np

from fuxictr_tpu.parallel import make_mesh
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)

VOCAB = 200_000
DIM = 16
N_CAT = 2


def _model(tag, **kw):
    from fuxictr_tpu.models.zoo.ranking import DCNv2
    fm = make_synthetic_feature_map(num_categorical=N_CAT, num_numeric=1,
                                    vocab_size=VOCAB, embedding_dim=DIM)
    return fm, DCNv2(fm, model_id=f"DCNv2_born_{tag}", embedding_dim=DIM,
                     model_structure="parallel",
                     stacked_dnn_hidden_units=[16],
                     parallel_dnn_hidden_units=[16],
                     num_cross_layers=1, model_root="/tmp/fx_born", **kw)


def _full_table_bytes():
    # the fused table_d16 concatenates both categorical vocabs (+pad/oov)
    return N_CAT * VOCAB * DIM * 4


def _tree_device_bytes(tree):
    """Per-device resident bytes of a pytree of jax.Arrays."""
    totals = {}
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array):
            for sh in leaf.addressable_shards:
                totals[sh.device] = totals.get(sh.device, 0) + sh.data.nbytes
    return totals


def _table_leaf(state):
    return state.params["embedding"][f"table_d{DIM}"]


def test_born_sharded_init_never_materializes_full_table():
    mesh = make_mesh(n_data=1, n_model=8)
    _, model = _model("init")
    model.distribute(mesh)           # mesh attached BEFORE init
    assert model._born_sharded is mesh

    table = _table_leaf(model.state)
    rows = table.shape[0]
    assert rows % 8 == 0
    seen_devices = set()
    for sh in table.addressable_shards:
        assert sh.data.shape == (rows // 8, DIM)
        seen_devices.add(sh.device)
    assert len(seen_devices) == 8

    # the driver-checkable budget claim: across params AND optimizer
    # moments, no device holds anywhere near a full table (a replicated
    # init would put >= 3x full-table bytes on device 0)
    per_dev = _tree_device_bytes(
        {"params": model.state.params, "opt": model.state.opt_state})
    full = _full_table_bytes()
    assert max(per_dev.values()) < full, (
        f"a device holds {max(per_dev.values())} bytes >= full table {full}")


def test_born_sharded_matches_single_device_init_and_step():
    # partitionable threefry: the sharded init must produce the SAME
    # values as the single-device init with the same seed
    _, single = _model("single")
    single.init_params()
    t_single = jax.device_get(_table_leaf(single.state))

    mesh = make_mesh(n_data=4, n_model=2)
    fm, born = _model("mesh")
    born.distribute(mesh)
    np.testing.assert_allclose(
        jax.device_get(_table_leaf(born.state)), t_single)

    batch = make_synthetic_batch(fm, batch_size=32, seed=11)
    rng = jax.random.PRNGKey(5)
    s1, loss1 = single._make_train_step()(
        single.state, jax.device_put(batch), rng)
    s2, loss2 = born._make_train_step()(
        born.state, born._place_batch(batch), rng)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        jax.device_get(s1.params["embedding"][f"table_d{DIM}"]),
        jax.device_get(s2.params["embedding"][f"table_d{DIM}"]),
        atol=1e-5)


def test_born_sharded_checkpoint_resume(tmp_path):
    mesh = make_mesh(n_data=1, n_model=8)
    fm, model = _model("ckpt")
    model.distribute(mesh)
    step = model._make_train_step()
    rng = jax.random.PRNGKey(3)
    batch = model._place_batch(make_synthetic_batch(fm, batch_size=16,
                                                    seed=7))
    state, _ = step(model.state, batch, rng)
    model.state = state
    ckpt = os.path.join(str(tmp_path), "born_ckpt")
    model.save_checkpoint(ckpt, use_orbax=True)

    # fresh model, mesh attached BEFORE restore: orbax restores each
    # shard directly into its born-sharded placement
    _, resumed = _model("resume")
    resumed.distribute(mesh)
    resumed.load_checkpoint(ckpt, use_orbax=True)

    table = _table_leaf(resumed.state)
    assert table.sharding.spec[0] == "model"
    per_dev = _tree_device_bytes(
        {"params": resumed.state.params, "opt": resumed.state.opt_state})
    assert max(per_dev.values()) < _full_table_bytes()

    np.testing.assert_allclose(
        jax.device_get(_table_leaf(model.state)),
        jax.device_get(table))

    # one more step from both: identical loss -> full state round-tripped
    rng2 = jax.random.PRNGKey(4)
    _, loss_a = step(model.state, batch, rng2)
    _, loss_b = resumed._make_train_step()(resumed.state, batch, rng2)
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
