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
