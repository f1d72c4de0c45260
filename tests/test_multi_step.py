"""steps_per_call scanned training: numerics match the per-step path."""

import jax
import numpy as np

from fuxictr_tpu.models.zoo.ranking import DNN
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)


def _fm():
    return make_synthetic_feature_map(num_categorical=4, num_numeric=2,
                                      vocab_size=30, embedding_dim=4)


class _Gen(list):
    pass


def test_scanned_fit_matches_per_step():
    batches = [make_synthetic_batch(_fm(), 16, seed=s) for s in range(4)]

    def run(steps_per_call):
        fm = _fm()
        m = DNN(fm, embedding_dim=4, hidden_units=(8,), verbose=0,
                model_root="/tmp/fx_msc", model_id=f"DNN_k{steps_per_call}",
                steps_per_call=steps_per_call, eval_steps=10**9)
        m.init_params()
        m._jit_train_step = m._make_train_step()
        m.valid_gen = _Gen([batches[0]])
        m._eval_steps = 10**9
        m._total_steps = 0
        m._stop_training = False
        m._epoch_index = 0
        m.train_epoch(_Gen(batches))
        return jax.device_get(m.state.params)

    p1 = run(1)
    p2 = run(2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_scanned_epoch_handles_variable_shapes():
    """LongCTR dedup buckets change batch shape mid-epoch; the scanned
    trainer must flush like-shaped groups instead of crashing np.stack."""
    from collections import OrderedDict

    from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
    from fuxictr_tpu.data.longctr_loader import (INVERSE_KEY, ITEMS_KEY,
                                                 SEQ_MASK_KEY)
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.registry import MODEL_REGISTRY
    import fuxictr_tpu.models.zoo  # noqa: F401

    B, L, V = 4, 3, 40
    fm = FeatureMap("syn_long_var", "")
    fm.features = OrderedDict([
        ("user_feat", {"source": "user", "type": "categorical",
                       "padding_idx": 0, "vocab_size": 8}),
        ("item_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": V}),
    ])
    fm.labels = ["clk"]
    fm.num_fields = fm.get_num_fields()
    fm.default_emb_dim = 4
    fm.set_column_index()
    rng = np.random.default_rng(0)

    def make_batch(cap):
        flat = rng.integers(1, V, B * (L + 1))
        uniq, inv = np.unique(flat, return_inverse=True)
        assert len(uniq) <= cap
        ids = np.zeros(cap, np.int64)
        ids[:len(uniq)] = uniq
        return {
            "user_feat": rng.integers(1, 8, B).astype(np.int64),
            SEQ_MASK_KEY: np.ones((B, L), np.float32),
            "clk": rng.integers(0, 2, B).astype(np.float32),
            SAMPLE_MASK_KEY: np.ones(B, np.float32),
            ITEMS_KEY: {"item_id": ids, INVERSE_KEY: inv.astype(np.int32)},
        }

    batches = [make_batch(16), make_batch(16), make_batch(32),
               make_batch(32), make_batch(16)]
    model = MODEL_REGISTRY["SIM"](
        fm, model_id="SIM_var", embedding_dim=4, attention_dim=4,
        dnn_hidden_units=(8,), topk=2, short_seq_len=2,
        steps_per_call=2, eval_steps=100,
        model_root="/tmp/fx_varshape")
    model._example_batch = lambda batch_size=2: batches[0]
    model.init_params()
    model.eval_step = lambda: None
    model._total_steps = 0
    model._stop_training = False
    model._train_epoch_scanned(iter(batches), 2)
    assert int(model._total_steps) == len(batches)
