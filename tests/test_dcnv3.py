"""DCNv3 semantics (no torch parity target: the reference README indexes
DCNv3 but the mounted tree ships no source — implemented from the paper,
arXiv:2407.13349). Property tests pin the architecture contract."""

import jax
import jax.numpy as jnp
import numpy as np

from fuxictr_tpu.models.registry import get_model
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)


def _model(**kw):
    fm = make_synthetic_feature_map(num_categorical=4, num_numeric=1,
                                    num_sequence=0, vocab_size=30,
                                    embedding_dim=8)
    cls = get_model("DCNv3")
    m = cls(fm, model_id="DCNv3_unit", embedding_dim=8,
            model_root="/tmp/fx_dcnv3_unit", **kw)
    m.init_params()
    batch = make_synthetic_batch(fm, batch_size=16, seed=1)
    return m, jax.device_put(batch)


def test_parallel_fuses_branch_logits():
    m, batch = _model(num_heads=2, num_deep_cross_layers=2,
                      num_shallow_cross_layers=2)
    out = m.net.apply({"params": m.state.params}, batch)
    assert set(out) >= {"y_pred", "y_d", "y_s"}
    np.testing.assert_allclose(out["y_pred"],
                               (out["y_d"] + out["y_s"]) * 0.5, rtol=1e-6)
    assert out["y_pred"].shape == (16, 1)


def test_single_branch_structures():
    for structure in ("ecn", "lcn"):
        m, batch = _model(structure=structure, num_deep_cross_layers=2,
                          num_shallow_cross_layers=2)
        out = m.net.apply({"params": m.state.params}, batch)
        assert "y_d" not in out and "y_s" not in out
        assert out["y_pred"].shape == (16, 1)


def test_tri_bce_weights_clip_at_zero():
    """A branch that is WORSE than the fused head adds bl*max(bl-L,0);
    a branch that is better adds nothing."""
    m, _ = _model()
    y = jnp.ones((8, 1))
    w = jnp.ones((8,))
    good = 5.0 * jnp.ones((8, 1))   # low BCE against y=1
    bad = -5.0 * jnp.ones((8, 1))   # high BCE against y=1

    base = m.add_loss({"y_pred": good}, y, w)
    # better-than-fused branch: clipped weight -> no contribution
    same = m.add_loss({"y_pred": good, "y_d": good, "y_s": good}, y, w)
    np.testing.assert_allclose(base, same, rtol=1e-6)
    # worse branch increases the loss
    worse = m.add_loss({"y_pred": good, "y_d": bad, "y_s": good}, y, w)
    assert float(worse) > float(base)


def test_head_divisibility_guard():
    import pytest
    with pytest.raises(ValueError):
        _model(num_heads=3)  # raises at init: 8 % 3 != 0
