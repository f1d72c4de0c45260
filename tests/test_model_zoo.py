"""Parametrized smoke test: every registered ranking model must init,
run one jitted train step (finite loss that decreases over a few steps on
a learnable synthetic task), and predict with the right shape."""

import importlib

import jax
import numpy as np
import pytest

importlib.import_module("fuxictr_tpu.models.zoo")
from fuxictr_tpu.models.registry import MODEL_REGISTRY
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)

# models needing special inputs (sequence/multitask) are tested elsewhere
RANKING_MODELS = sorted(
    name for name, cls in MODEL_REGISTRY.items()
    if not getattr(cls, "_requires_sequence", False)
    and not getattr(cls, "_multitask", False)
    and not getattr(cls, "_longctr", False))


@pytest.fixture(scope="module")
def tiny_fm():
    return make_synthetic_feature_map(
        num_categorical=5, num_numeric=2, num_sequence=1, seq_len=4,
        vocab_size=50, embedding_dim=8)


@pytest.mark.parametrize("name", RANKING_MODELS)
def test_model_trains_and_predicts(name, tiny_fm):
    cls = MODEL_REGISTRY[name]
    model = cls(tiny_fm, model_id=f"{name}_smoke", embedding_dim=8,
                model_root="/tmp/fx_zoo_smoke")
    model.init_params()
    batch = make_synthetic_batch(tiny_fm, batch_size=16, seed=0)
    # adversarial tail: fully-padded rows (ids 0, sample mask 0) — the
    # NaN-at-zero-gradient trap (norm/arctan2/sqrt of an all-zero
    # embedding row has a NaN local derivative even under a 0 cotangent;
    # caught live in SDIM's l2-norm)
    for k, v in batch.items():
        v[-4:] = 0
    batch = jax.device_put(batch)
    step = model._make_train_step()
    rng = jax.random.PRNGKey(0)
    state = model.state
    losses = []
    for i in range(3):
        state, loss = step(state, batch, rng)
        losses.append(float(loss))
    assert np.isfinite(losses).all(), f"{name}: non-finite loss {losses}"
    for path, leaf in jax.tree_util.tree_leaves_with_path(
            jax.device_get(state.params)):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.isfinite(arr).all(), \
                f"{name}: non-finite params after step at {path}"
    model.state = state
    pred_step = model._make_predict_step()
    y = np.asarray(pred_step(state, batch))
    assert y.shape[0] == 16
    assert np.isfinite(y).all()
    assert (y >= 0).all() and (y <= 1).all()   # sigmoid output
