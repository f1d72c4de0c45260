"""Behavior-sequence models: DIN, DIEN, BST, TransAct.

These consume per-field embedding dicts (raw [B, L, D] sequences) rather
than the stacked tensor; masks derive from sequence ids (padding_idx 0).
"""

from typing import Any, Sequence, Tuple, Union

import flax.linen as nn
import jax
import numpy as np
import jax.numpy as jnp
import optax

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.attention import (DINAttention, TransformerEncoderLayer)
from fuxictr_tpu.ops.common import xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.interactions import CrossNetV2
from fuxictr_tpu.ops.mlp import MLP_Block
from fuxictr_tpu.ops.pooling import masked_sum_pool
from fuxictr_tpu.ops.sequence import AttentionalGRU, MaskedGRU

_NEG_INF = -1.0e9


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _dense(units, name, use_bias=True):
    return nn.Dense(units, use_bias=use_bias, kernel_init=xavier_normal(),
                    bias_init=zeros_init, name=name)


def _as_list(x):
    return x if isinstance(x, list) else [x]


def _tuplify(field):
    """YAML gives tuples as lists; normalize a field spec to a tuple/str."""
    if isinstance(field, (list, tuple)):
        return tuple(field)
    return field


def _field_names(field):
    f = _tuplify(field)
    return list(f) if isinstance(f, tuple) else [f]


def _concat_field_emb(emb_dict, field):
    f = _tuplify(field)
    if isinstance(f, tuple):
        return jnp.concatenate([emb_dict[name] for name in f], axis=-1)
    return emb_dict[f]


# -------------------------------------------------------------------- DIN
class _DINNet(nn.Module):
    """DIN (ref: model_zoo/DIN/src/DIN.py:26-160): target attention pools
    each behavior sequence; pooled embs replace the sequence fields in the
    flattened input of the DNN."""

    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_hidden_units: Sequence[int] = (64,)
    attention_hidden_activations: str = "dice"
    attention_output_activation: str = None
    attention_dropout: float = 0.0
    net_dropout: float = 0.0
    batch_norm: bool = False
    din_target_field: Any = None
    din_sequence_field: Any = None
    din_use_softmax: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        target_fields = _as_list(self.din_target_field)
        sequence_fields = _as_list(self.din_sequence_field)
        for idx, (t_field, s_field) in enumerate(zip(target_fields,
                                                     sequence_fields)):
            target_emb = _concat_field_emb(emb_dict, t_field)
            sequence_emb = _concat_field_emb(emb_dict, s_field)
            seq_name = _field_names(s_field)[0]
            mask = batch[seq_name] != 0
            pooled = DINAttention(
                embedding_dim=target_emb.shape[-1],
                attention_units=tuple(self.attention_hidden_units),
                hidden_activations=self.attention_hidden_activations,
                output_activation=self.attention_output_activation,
                dropout_rate=self.attention_dropout,
                use_softmax=self.din_use_softmax,
                name=f"attention_{idx}")(target_emb, sequence_emb, mask,
                                         train=train)
            for i, name in enumerate(_field_names(s_field)):
                emb_dict[name] = pooled[
                    :, i * self.embedding_dim:(i + 1) * self.embedding_dim]
        feature_emb = emb_layer.dict2tensor(emb_dict, flatten_emb=True)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(feature_emb, train=train)
        return {"y_pred": y}


@register_model
class DIN(RankModel):
    """DIN (ref: model_zoo/DIN/src/DIN.py:26-160)."""

    _requires_sequence = True

    def __init__(self, feature_map, model_id="DIN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", attention_hidden_units=(64,),
                 attention_hidden_activations="Dice",
                 attention_output_activation=None, attention_dropout=0.0,
                 net_dropout=0.0, batch_norm=False,
                 din_target_field=("item_id", "cate_id"),
                 din_sequence_field=("click_history", "cate_history"),
                 din_use_softmax=False, **kwargs):
        net = _DINNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                      dnn_activations, tuple(attention_hidden_units),
                      attention_hidden_activations,
                      attention_output_activation, attention_dropout,
                      net_dropout, batch_norm, din_target_field,
                      din_sequence_field, din_use_softmax)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- DIEN
class _DIENNet(nn.Module):
    """DIEN (ref: model_zoo/DIEN/src/DIEN.py:27-520): GRU interest
    extraction → (A/AU/AI)GRU interest evolution with target attention;
    optional auxiliary next-behavior loss on GRU states."""

    feature_map: Any
    embedding_dim: int = 16
    dnn_hidden_units: Sequence[int] = (200, 80)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = True
    dien_target_field: Any = None
    dien_sequence_field: Any = None
    dien_neg_seq_field: Any = None
    gru_type: str = "AUGRU"
    enable_sum_pooling: bool = False
    attention_dropout: float = 0.0
    attention_type: str = "bilinear_attention"
    attention_hidden_units: Sequence[int] = (80, 40)
    attention_activation: str = "Dice"
    use_attention_softmax: bool = True
    aux_hidden_units: Sequence[int] = (100, 50)
    aux_activation: str = "relu"
    aux_loss_alpha: float = 0.0

    def _attention(self, idx, sequence_emb, target_emb, mask, train):
        """Attention scores [B, L] (ref DIEN.py:313-370)."""
        L = sequence_emb.shape[1]
        D = sequence_emb.shape[-1]
        if self.attention_type == "dot_attention":
            score = jnp.einsum("bld,bd->bl", sequence_emb, target_emb)
        elif self.attention_type == "bilinear_attention":
            W = self.param(f"W_kernel_{idx}",
                           lambda k, s: jnp.eye(s[0]), (D, D))
            score = jnp.einsum("bld,de,be->bl", sequence_emb, W, target_emb)
        elif self.attention_type == "din_attention":
            t = jnp.broadcast_to(target_emb[:, None, :], sequence_emb.shape)
            concat = jnp.concatenate(
                [t, sequence_emb, t - sequence_emb, t * sequence_emb],
                axis=-1)
            score = MLP_Block(
                hidden_units=tuple(self.attention_hidden_units),
                hidden_activations=self.attention_activation,
                output_dim=1, dropout_rates=self.attention_dropout,
                name=f"attn_mlp_{idx}")(concat, train=train)[..., 0]
        else:
            raise ValueError(f"attention_type={self.attention_type}")
        score = score * mask.astype(score.dtype)
        if self.use_attention_softmax:
            score = score + _NEG_INF * (1.0 - mask.astype(score.dtype))
            score = jax.nn.softmax(score, axis=-1)
        return score

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        target_fields = _as_list(self.dien_target_field)
        sequence_fields = _as_list(self.dien_sequence_field)
        neg_fields = _as_list(self.dien_neg_seq_field) \
            if self.dien_neg_seq_field else [None] * len(target_fields)
        concat_emb = []
        outputs = {}
        for idx, (t_field, s_field, n_field) in enumerate(
                zip(target_fields, sequence_fields, neg_fields)):
            target_emb = _concat_field_emb(emb_dict, t_field)
            sequence_emb = _concat_field_emb(emb_dict, s_field)
            seq_name = _field_names(s_field)[0]
            mask = batch[seq_name] > 0
            model_dim = sequence_emb.shape[-1]
            interest_emb, _ = MaskedGRU(
                model_dim, name=f"extraction_{idx}")(sequence_emb, mask)
            if self.gru_type == "GRU":
                _, h_out = MaskedGRU(model_dim, name=f"evolving_{idx}")(
                    interest_emb, mask)
            else:
                attn = self._attention(idx, interest_emb, target_emb, mask,
                                       train)
                if self.gru_type == "AIGRU":
                    _, h_out = MaskedGRU(model_dim, name=f"evolving_{idx}")(
                        interest_emb * attn[..., None], mask)
                else:
                    h_out = AttentionalGRU(
                        model_dim, self.gru_type,
                        name=f"evolving_{idx}")(interest_emb, attn, mask)
            concat_emb.append(h_out)
            if self.enable_sum_pooling:
                sum_pool = masked_sum_pool(
                    sequence_emb, jnp.any(sequence_emb != 0, axis=-1))
                concat_emb += [sum_pool, target_emb * sum_pool]
            if self.aux_loss_alpha > 0 and n_field is not None:
                neg_emb = _concat_field_emb(emb_dict, n_field)
                outputs.setdefault("aux_loss", 0.0)
                outputs["aux_loss"] = outputs["aux_loss"] + self._aux_loss(
                    idx, interest_emb, sequence_emb, neg_emb, mask, train)
        skip_fields = set()
        for n_field in neg_fields:
            if n_field is not None:
                skip_fields.update(_field_names(n_field))
        for name, emb in emb_dict.items():
            if emb.ndim == 2 and name not in skip_fields:
                concat_emb.append(emb)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(jnp.concatenate(concat_emb, axis=-1),
                                  train=train)
        outputs["y_pred"] = y
        return outputs

    def _aux_loss(self, idx, interest_emb, pos_emb, neg_emb, mask, train):
        """Binary aux loss on (state_t, behavior_{t+1}) pairs
        (ref DIEN.py:196-239)."""
        model_dim = interest_emb.shape[-1]
        aux_net = MLP_Block(hidden_units=tuple(self.aux_hidden_units),
                            hidden_activations=self.aux_activation,
                            output_dim=1, output_activation="sigmoid",
                            name=f"aux_net_{idx}")
        pos_in = jnp.concatenate(
            [interest_emb[:, :-1, :], pos_emb[:, 1:, :]], axis=-1)
        neg_in = jnp.concatenate(
            [interest_emb[:, :-1, :], neg_emb[:, 1:, :]], axis=-1)
        pos_prob = aux_net(pos_in.reshape(-1, model_dim * 2),
                           train=train).reshape(-1)
        neg_prob = aux_net(neg_in.reshape(-1, model_dim * 2),
                           train=train).reshape(-1)
        eps = 1e-7
        bce = -(jnp.log(pos_prob + eps) + jnp.log(1.0 - neg_prob + eps))
        m = mask[:, 1:].astype(bce.dtype).reshape(-1)
        aux = jnp.sum(bce * m) / (jnp.sum(m) + 1e-9)
        return self.aux_loss_alpha * aux


@register_model
class DIEN(RankModel):
    """DIEN (ref: model_zoo/DIEN/src/DIEN.py:27-520)."""

    _requires_sequence = True

    def __init__(self, feature_map, model_id="DIEN", learning_rate=1e-3,
                 embedding_dim=16, dnn_hidden_units=(200, 80),
                 dnn_activations="relu", net_dropout=0.0, batch_norm=True,
                 dien_target_field=("item_id", "cate_id"),
                 dien_sequence_field=("click_history", "cate_history"),
                 dien_neg_seq_field=None, gru_type="AUGRU",
                 enable_sum_pooling=False, attention_dropout=0.0,
                 attention_type="bilinear_attention",
                 attention_hidden_units=(80, 40), attention_activation="Dice",
                 use_attention_softmax=True, aux_hidden_units=(100, 50),
                 aux_activation="relu", aux_loss_alpha=0.0, **kwargs):
        net = _DIENNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                       dnn_activations, net_dropout, batch_norm,
                       dien_target_field, dien_sequence_field,
                       dien_neg_seq_field, gru_type, enable_sum_pooling,
                       attention_dropout, attention_type,
                       tuple(attention_hidden_units), attention_activation,
                       use_attention_softmax, tuple(aux_hidden_units),
                       aux_activation, aux_loss_alpha)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- BST
class _BSTNet(nn.Module):
    """BST (ref: model_zoo/BST/src/BST.py): transformer over behavior
    sequence + appended target item, with positional embeddings and
    mean/sum/target/concat pooling."""

    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (256, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    num_heads: int = 2
    stacked_transformer_layers: int = 1
    attention_dropout: float = 0.0
    net_dropout: float = 0.0
    batch_norm: bool = False
    layer_norm: bool = True
    use_residual: bool = True
    bst_target_field: Any = None
    bst_sequence_field: Any = None
    seq_pooling_type: str = "mean"
    use_position_emb: bool = True
    use_causal_mask: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        target_fields = _as_list(self.bst_target_field)
        sequence_fields = _as_list(self.bst_sequence_field)
        concat_emb = []
        pooled_list = []
        seq_field_names = set()
        for idx, (t_field, s_field) in enumerate(zip(target_fields,
                                                     sequence_fields)):
            target_emb = _concat_field_emb(emb_dict, t_field)
            sequence_emb = _concat_field_emb(emb_dict, s_field)
            seq_name = _field_names(s_field)[0]
            seq_field_names.update(_field_names(s_field))
            # sequence + target appended at the end
            seq = jnp.concatenate([sequence_emb, target_emb[:, None, :]],
                                  axis=1)
            L = seq.shape[1]
            valid = jnp.concatenate(
                [batch[seq_name] != 0,
                 jnp.ones((seq.shape[0], 1), bool)], axis=1)
            if self.use_position_emb:
                # learnable, sinusoid-initialized, CONCATENATED (not added)
                # — BST.py:286-298
                def _pe_init(key, shape):
                    Ls, Dp = shape
                    pos = np.arange(Ls)[:, None].astype(np.float32)
                    div = np.exp(np.arange(0, Dp, 2, dtype=np.float32)
                                 * (-np.log(10000.0) / Dp))
                    pe = np.zeros((Ls, Dp), np.float32)
                    pe[:, 0::2] = np.sin(pos * div)
                    pe[:, 1::2] = np.cos(pos * div[:Dp // 2])
                    return jnp.asarray(pe)
                pos = self.param(f"pos_emb_{idx}", _pe_init,
                                 (L, self.embedding_dim))
                seq = jnp.concatenate(
                    [seq, jnp.broadcast_to(pos[None], (seq.shape[0], L,
                                                       self.embedding_dim))],
                    axis=-1)
            model_dim = seq.shape[-1]
            # BST mask semantics (BST.py:185-208): keys maskable by padding
            # but the diagonal always attends; optional causal triangle
            key_pad = ~valid                                 # [B, L]
            blocked = jnp.repeat(key_pad[:, None, :], L, axis=1)
            blocked = blocked & ~jnp.eye(L, dtype=bool)[None]
            if self.use_causal_mask:
                blocked = blocked | jnp.triu(
                    jnp.ones((L, L), bool), 1)[None]
            x = seq
            for layer in range(self.stacked_transformer_layers):
                x = TransformerEncoderLayer(
                    model_dim=model_dim, num_heads=self.num_heads,
                    ff_dim=model_dim, dropout_rate=self.attention_dropout,
                    ffn_activation="leaky_relu",
                    name=f"transformer_{idx}_{layer}")(
                        x, attn_mask=~blocked, train=train)
            m = valid[..., None].astype(x.dtype)
            if self.seq_pooling_type == "mean":
                pooled = (x * m).sum(axis=1) / (m.sum(axis=1) + 1e-12)
            elif self.seq_pooling_type == "sum":
                pooled = (x * m).sum(axis=1)
            elif self.seq_pooling_type == "target":
                pooled = x[:, -1, :]
            elif self.seq_pooling_type == "concat":
                pooled = _flat(x)    # reference does not re-mask (BST.py:227)
            else:
                raise ValueError(
                    f"seq_pooling_type={self.seq_pooling_type} not supported.")
            pooled_list.append(pooled)
        for name, emb in emb_dict.items():
            if name not in seq_field_names and emb.ndim == 2:
                concat_emb.append(emb)
        concat_emb += pooled_list
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(jnp.concatenate(concat_emb, axis=-1),
                                  train=train)
        return {"y_pred": y}


@register_model
class BST(RankModel):
    """BST (ref: model_zoo/BST/src/BST.py)."""

    _requires_sequence = True

    def __init__(self, feature_map, model_id="BST", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(256, 128, 64),
                 dnn_activations="relu", num_heads=2,
                 stacked_transformer_layers=1, attention_dropout=0.0,
                 net_dropout=0.0, batch_norm=False, layer_norm=True,
                 use_residual=True, bst_target_field=("item_id", "cate_id"),
                 bst_sequence_field=("click_history", "cate_history"),
                 seq_pooling_type="mean", use_position_emb=True,
                 use_causal_mask=False, **kwargs):
        net = _BSTNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                      dnn_activations, num_heads, stacked_transformer_layers,
                      attention_dropout, net_dropout, batch_norm, layer_norm,
                      use_residual, bst_target_field, bst_sequence_field,
                      seq_pooling_type, use_position_emb, use_causal_mask)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- TransAct
class _TransActNet(nn.Module):
    """TransAct (ref: model_zoo/TransAct/src/TransAct.py:36-320):
    transformer over [seq ‖ broadcast target], first-k outputs + masked max
    pool, fused into a DCNv2 (parallel) head."""

    feature_map: Any
    embedding_dim: int = 64
    hidden_activations: Union[str, Sequence[str]] = "relu"
    dcn_cross_layers: int = 3
    dcn_hidden_units: Sequence[int] = (256, 128, 64)
    mlp_hidden_units: Sequence[int] = ()
    num_heads: int = 1
    transformer_layers: int = 1
    transformer_dropout: float = 0.0
    dim_feedforward: int = 512
    net_dropout: float = 0.0
    batch_norm: bool = False
    target_item_field: Any = None
    sequence_item_field: Any = None
    first_k_cols: int = 1
    concat_max_pool: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        target_fields = _as_list(self.target_item_field)
        sequence_fields = _as_list(self.sequence_item_field)
        concat_emb = []
        seq_field_names = set()
        for idx, (t_field, s_field) in enumerate(zip(target_fields,
                                                     sequence_fields)):
            target_emb = _concat_field_emb(emb_dict, t_field)
            sequence_emb = _concat_field_emb(emb_dict, s_field)
            seq_name = _field_names(s_field)[0]
            seq_field_names.update(_field_names(s_field))
            L = sequence_emb.shape[1]
            valid = jnp.asarray(batch[seq_name]) != 0
            # rows with empty history attend to the last position
            all_empty = ~jnp.any(valid, axis=1)
            valid = valid.at[:, -1].set(valid[:, -1] | all_empty)
            x = jnp.concatenate(
                [sequence_emb,
                 jnp.broadcast_to(target_emb[:, None, :],
                                  (sequence_emb.shape[0], L,
                                   target_emb.shape[-1]))], axis=-1)
            model_dim = x.shape[-1]
            for layer in range(self.transformer_layers):
                x = TransformerEncoderLayer(
                    model_dim=model_dim, num_heads=self.num_heads,
                    ff_dim=self.dim_feedforward,
                    dropout_rate=self.transformer_dropout,
                    name=f"transformer_{idx}_{layer}")(
                        x, mask=valid, train=train)
            x = x * valid[..., None].astype(x.dtype)
            out = [_flat(x[:, -self.first_k_cols:, :])]
            if self.concat_max_pool:
                x_masked = jnp.where(valid[..., None], x, _NEG_INF)
                pooled = _dense(model_dim, f"out_linear_{idx}")(
                    jnp.max(x_masked, axis=1))
                out.append(pooled)
            concat_emb.append(jnp.concatenate(out, axis=-1))
        # reference order (TransAct.py:178-182): dict-order embeddings
        # (targets in place, sequence fields removed), transformer outputs
        # appended at the end
        dict_embs = [emb for name, emb in emb_dict.items()
                     if name not in seq_field_names and emb.ndim == 2]
        dcn_in = jnp.concatenate(dict_embs + concat_emb, axis=-1)
        cross = CrossNetV2(dcn_in.shape[-1], self.dcn_cross_layers,
                           name="crossnet")(dcn_in)
        deep = MLP_Block(hidden_units=tuple(self.dcn_hidden_units),
                         hidden_activations=self.hidden_activations,
                         dropout_rates=self.net_dropout,
                         batch_norm=self.batch_norm,
                         name="parallel_dnn")(dcn_in, train=train)
        y = MLP_Block(hidden_units=tuple(self.mlp_hidden_units),
                      hidden_activations=self.hidden_activations,
                      output_dim=1, name="mlp")(
            jnp.concatenate([cross, deep], axis=-1), train=train)
        return {"y_pred": y}


@register_model
class TransAct(RankModel):
    """TransAct (ref: model_zoo/TransAct/src/TransAct.py:36-320)."""

    _requires_sequence = True

    def __init__(self, feature_map, model_id="TransAct", learning_rate=1e-3,
                 embedding_dim=64, hidden_activations="relu",
                 dcn_cross_layers=3, dcn_hidden_units=(256, 128, 64),
                 mlp_hidden_units=(), num_heads=1, transformer_layers=1,
                 transformer_dropout=0.0, dim_feedforward=512,
                 net_dropout=0.0, batch_norm=False,
                 target_item_field=("item_id", "cate_id"),
                 sequence_item_field=("click_history", "cate_history"),
                 first_k_cols=1, use_time_window_mask=False,
                 time_window_ms=86400000, concat_max_pool=True, **kwargs):
        net = _TransActNet(feature_map, embedding_dim, hidden_activations,
                           dcn_cross_layers, tuple(dcn_hidden_units),
                           tuple(mlp_hidden_units), num_heads,
                           transformer_layers, transformer_dropout,
                           dim_feedforward, net_dropout, batch_norm,
                           target_item_field, sequence_item_field,
                           first_k_cols, concat_max_pool)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
