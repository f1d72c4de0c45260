"""Behavior-sequence model tests (DIN/DIEN/BST/TransAct) on a synthetic
Amazon-style schema, plus AUGRU semantics checks."""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models.registry import MODEL_REGISTRY
from fuxictr_tpu.ops.sequence import AttentionalGRU, MaskedGRU

import fuxictr_tpu.models.zoo  # noqa: F401  (registers models)

SEQ_LEN = 6
VOCAB_ITEM, VOCAB_CATE = 60, 12


@pytest.fixture(scope="module")
def seq_fm():
    fm = FeatureMap("synthetic_seq", data_dir="")
    fm.features = OrderedDict([
        ("user_id", {"source": "user", "type": "categorical",
                     "padding_idx": 0, "vocab_size": 30}),
        ("item_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": VOCAB_ITEM}),
        ("cate_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": VOCAB_CATE}),
        ("click_history", {"source": "user", "type": "sequence",
                           "share_embedding": "item_id", "padding_idx": 0,
                           "vocab_size": VOCAB_ITEM, "max_len": SEQ_LEN}),
        ("cate_history", {"source": "user", "type": "sequence",
                          "share_embedding": "cate_id", "padding_idx": 0,
                          "vocab_size": VOCAB_CATE, "max_len": SEQ_LEN}),
        ("neg_click_history", {"source": "user", "type": "sequence",
                               "share_embedding": "item_id", "padding_idx": 0,
                               "vocab_size": VOCAB_ITEM, "max_len": SEQ_LEN}),
        ("neg_cate_history", {"source": "user", "type": "sequence",
                              "share_embedding": "cate_id", "padding_idx": 0,
                              "vocab_size": VOCAB_CATE, "max_len": SEQ_LEN}),
    ])
    fm.labels = ["label"]
    fm.num_fields = fm.get_num_fields()
    fm.default_emb_dim = 8
    fm.set_column_index()
    return fm


def _seq_batch(n=16, seed=0):
    rng = np.random.default_rng(seed)
    lens = rng.integers(0, SEQ_LEN + 1, n)
    def seq(vocab):
        out = np.zeros((n, SEQ_LEN), np.int32)
        for i, l in enumerate(lens):
            out[i, :l] = rng.integers(1, vocab, l)
        return out
    return {
        "user_id": rng.integers(1, 30, n).astype(np.int32),
        "item_id": rng.integers(1, VOCAB_ITEM, n).astype(np.int32),
        "cate_id": rng.integers(1, VOCAB_CATE, n).astype(np.int32),
        "click_history": seq(VOCAB_ITEM),
        "cate_history": seq(VOCAB_CATE),
        "neg_click_history": seq(VOCAB_ITEM),
        "neg_cate_history": seq(VOCAB_CATE),
        "label": rng.integers(0, 2, n).astype(np.float32),
        "__mask__": np.ones(n, np.float32),
    }


MODEL_KW = {
    "DIN": dict(din_target_field=("item_id", "cate_id"),
                din_sequence_field=("click_history", "cate_history")),
    "DIEN": dict(dien_target_field=("item_id", "cate_id"),
                 dien_sequence_field=("click_history", "cate_history"),
                 dien_neg_seq_field=("neg_click_history", "neg_cate_history"),
                 aux_loss_alpha=0.5, gru_type="AUGRU"),
    "BST": dict(bst_target_field=("item_id", "cate_id"),
                bst_sequence_field=("click_history", "cate_history")),
    "TransAct": dict(target_item_field=("item_id", "cate_id"),
                     sequence_item_field=("click_history", "cate_history"),
                     dim_feedforward=32, dcn_hidden_units=(32,)),
}


@pytest.mark.parametrize("name", sorted(MODEL_KW))
def test_sequence_model_trains(name, seq_fm):
    cls = MODEL_REGISTRY[name]
    model = cls(seq_fm, model_id=f"{name}_seq_smoke", embedding_dim=8,
                model_root="/tmp/fx_seq_smoke", **MODEL_KW[name])
    model.init_params()
    batch = jax.device_put(_seq_batch())
    step = model._make_train_step()
    state, loss = step(model.state, batch, jax.random.PRNGKey(0))
    state, loss2 = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and np.isfinite(float(loss2))
    model.state = state
    y = np.asarray(model._make_predict_step()(state, batch))
    assert y.shape[0] == 16 and np.isfinite(y).all()


def test_dien_gru_variants(seq_fm):
    for gru_type in ["GRU", "AIGRU", "AGRU", "AUGRU"]:
        model = MODEL_REGISTRY["DIEN"](
            seq_fm, model_id=f"DIEN_{gru_type}", embedding_dim=8,
            gru_type=gru_type, model_root="/tmp/fx_seq_smoke",
            dien_target_field=("item_id", "cate_id"),
            dien_sequence_field=("click_history", "cate_history"),
            dien_neg_seq_field=None, aux_loss_alpha=0)
        model.init_params()
        batch = jax.device_put(_seq_batch(8))
        _, loss = model._make_train_step()(model.state, batch,
                                           jax.random.PRNGKey(0))
        assert np.isfinite(float(loss)), gru_type


def test_masked_gru_respects_padding():
    """Final state must equal the state at each row's last valid step."""
    B, L, D, H = 3, 5, 4, 4
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0],
                                 [1, 1, 1, 1, 1],
                                 [1, 0, 0, 0, 0]], bool))
    gru = MaskedGRU(H)
    params = gru.init(jax.random.PRNGKey(0), seq, mask)
    outs, h = gru.apply(params, seq, mask)
    # padded outputs are zero
    np.testing.assert_allclose(np.asarray(outs)[0, 3:], 0, atol=0)
    # final state equals output at the last valid position
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(outs[0, 2]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h[1]), np.asarray(outs[1, 4]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(h[2]), np.asarray(outs[2, 0]),
                               rtol=1e-6)
    # a row identical except for trailing padding gives the same state
    seq2 = seq.at[0, 3:].set(99.0)   # garbage in padded region
    _, h2 = gru.apply(params, seq2, mask)
    np.testing.assert_allclose(np.asarray(h[0]), np.asarray(h2[0]), rtol=1e-6)


def test_augru_zero_attention_freezes_state():
    """With attention=0 the AUGRU state never moves (update gate scaled)."""
    B, L, D = 2, 4, 3
    seq = jnp.ones((B, L, D))
    mask = jnp.ones((B, L), bool)
    attn = jnp.zeros((B, L))
    gru = AttentionalGRU(D, "AUGRU")
    params = gru.init(jax.random.PRNGKey(0), seq, attn, mask)
    h = gru.apply(params, seq, attn, mask)
    np.testing.assert_allclose(np.asarray(h), 0, atol=1e-7)


MODEL_KW["DMIN"] = dict(target_field=("item_id", "cate_id"),
                        sequence_field=("click_history", "cate_history"),
                        neg_seq_field=("neg_click_history",
                                       "neg_cate_history"),
                        aux_loss_lambda=0.2, num_heads=2,
                        dnn_hidden_units=(32,))
MODEL_KW["DMR"] = dict(target_field=("item_id", "cate_id"),
                       sequence_field=("click_history", "cate_history"),
                       neg_seq_field=("neg_click_history",
                                      "neg_cate_history"),
                       aux_loss_beta=0.2, enable_i2i_rel=True,
                       dnn_hidden_units=(32,))


@pytest.mark.parametrize("name", ["DMIN", "DMR"])
def test_dmin_dmr_train(name, seq_fm):
    cls = MODEL_REGISTRY[name]
    model = cls(seq_fm, model_id=f"{name}_seq_smoke", embedding_dim=8,
                model_root="/tmp/fx_seq_smoke", **MODEL_KW[name])
    model.init_params()
    batch = jax.device_put(_seq_batch())
    step = model._make_train_step()
    state, loss = step(model.state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    y = np.asarray(model._make_predict_step()(state, batch))
    assert y.shape[0] == 16 and np.isfinite(y).all()
