"""Lazy (touched-rows-only) adam for fused embedding tables.

Semantics = torch SparseAdam: moment decay and updates happen only on rows
the embedding layer gathered this step (recorded via the ``touched_rows``
sow). When every gradient-carrying row is touched every step, lazy adam IS
dense adam — asserted exactly below.
"""

import jax
import numpy as np
import pytest

from fuxictr_tpu.models.zoo.ranking import DNN
from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map


def _model(tmp_path, lazy, seed=2019):
    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=1,
                                    vocab_size=10, embedding_dim=4)
    m = DNN(fm, embedding_dim=4, hidden_units=(8,),
            model_root=str(tmp_path), lazy_adam=lazy, seed=seed)
    m.init_params()
    return m


def _full_batch():
    """Every id of every field appears → full row coverage each step."""
    n = 10
    batch = {f"C{i+1}": np.arange(n, dtype=np.int32) for i in range(3)}
    batch["I1"] = np.linspace(-1, 1, n).astype(np.float32)
    batch["label"] = (np.arange(n) % 2).astype(np.float32)
    batch["__mask__"] = np.ones(n, np.float32)
    return batch


def test_full_coverage_matches_dense_adam(tmp_path):
    batch = jax.device_put(_full_batch())
    dense = _model(tmp_path / "d", lazy=False)
    lazy = _model(tmp_path / "l", lazy=True)
    step_d = dense._make_train_step()
    step_l = lazy._make_train_step()
    for s in range(4):
        rng = jax.random.PRNGKey(s)
        dense.state, loss_d = step_d(dense.state, batch, rng)
        lazy.state, loss_l = step_l(lazy.state, batch, rng)
        np.testing.assert_allclose(float(loss_d), float(loss_l), rtol=1e-6)
    import flax
    fd = flax.traverse_util.flatten_dict(jax.device_get(dense.state.params))
    fl = flax.traverse_util.flatten_dict(jax.device_get(lazy.state.params))
    assert set(fd) == set(fl)
    for path in fd:
        np.testing.assert_allclose(fd[path], fl[path], rtol=2e-5,
                                   atol=1e-7, err_msg=str(path))


def test_untouched_rows_frozen(tmp_path):
    m = _model(tmp_path, lazy=True)
    table0 = np.asarray(
        jax.device_get(m.state.params["embedding"]["table_d4"]))
    batch = _full_batch()
    # restrict field C1 to ids {1, 2}: C1 rows 3.. must stay frozen
    batch["C1"] = np.asarray([1, 2] * 5, np.int32)
    step = m._make_train_step()
    for s in range(3):
        m.state, _ = step(m.state, jax.device_put(batch),
                          jax.random.PRNGKey(s))
    table = np.asarray(
        jax.device_get(m.state.params["embedding"]["table_d4"]))
    # layout: C1 occupies rows [0, 10); ids 3..9 were never gathered
    np.testing.assert_array_equal(table[3:10], table0[3:10])
    # touched rows did move
    assert np.abs(table[1:3] - table0[1:3]).max() > 0
    # other fields (rows 10..30, fully covered) all moved
    assert np.abs(table[10:] - table0[10:]).min() >= 0
    assert np.abs(table[10:] - table0[10:]).max() > 0


def test_lazy_adam_longctr_dedup(tmp_path):
    """The dedup path (unique ids + inverse) trains under lazy adam."""
    from fuxictr_tpu.config import load_config
    from fuxictr_tpu.experiment import run_expid
    params = load_config("/root/repo/configs/tiny", "SIM_test")
    params.update(model_root=str(tmp_path), lazy_adam=True,
                  embedding_regularizer=None, net_regularizer=None)
    result = run_expid("/root/repo/configs/tiny", "SIM_test", params=params)
    assert 0.0 < result["valid"]["AUC"] <= 1.0
    assert np.isfinite(result["valid"]["logloss"])


def test_lr_decay_with_lazy_opt_state(tmp_path):
    m = _model(tmp_path, lazy=True)
    np.testing.assert_allclose(m.lr_decay(), 1e-4, rtol=1e-6)


def test_lazy_adam_rejects_regularizer(tmp_path):
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=0,
                                    vocab_size=8, embedding_dim=4)
    m = DNN(fm, embedding_dim=4, hidden_units=(8,),
            model_root=str(tmp_path), lazy_adam=True,
            embedding_regularizer="l2(1e-5)")
    with pytest.raises(ValueError):
        m.init_params()
