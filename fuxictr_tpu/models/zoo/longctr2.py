"""LongCTR variants of standard models: DIN, DIEN, DCNv2, FinalMLP,
TransAct operating on side-table batches (ref: model_zoo/LongCTR/{DIN,DIEN,
DCNv2,FinalMLP,TransAct}/*.py). Registered with a ``Long`` prefix since the
reference disambiguates them by config directory."""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.models.zoo.longctr import _LongCTRBase, _dense
from fuxictr_tpu.ops.attention import DINAttention, TransformerEncoderLayer
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.interactions import CrossNetV2
from fuxictr_tpu.ops.mlp import MLP_Block
from fuxictr_tpu.ops.pooling import masked_average_pool
from fuxictr_tpu.ops.sequence import AttentionalGRU, MaskedGRU

_NEG_INF = -1.0e9


# ---------------------------------------------------------------- LongDIN
class _LongDINNet(_LongCTRBase):
    """(ref: model_zoo/LongCTR/DIN/DIN.py)"""

    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_hidden_units: Sequence[int] = (64,)
    attention_hidden_activations: str = "dice"
    attention_output_activation: str = None
    attention_dropout: float = 0.0
    din_use_softmax: bool = False
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        sequence_emb = item_emb[:, :-1, :]
        pooled = DINAttention(
            embedding_dim=target_emb.shape[-1],
            attention_units=tuple(self.attention_hidden_units),
            hidden_activations=self.attention_hidden_activations,
            output_activation=self.attention_output_activation,
            dropout_rate=self.attention_dropout,
            use_softmax=self.din_use_softmax,
            name="attention")(target_emb, sequence_emb, mask, train=train)
        x = jnp.concatenate(emb_list + [target_emb, pooled], axis=-1)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm, name="dnn")(x, train=train)
        return {"y_pred": y}


@register_model
class LongDIN(RankModel):
    """DIN over LongCTR side tables (ref: model_zoo/LongCTR/DIN/DIN.py)."""

    _longctr = True

    def __init__(self, feature_map, model_id="LongDIN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", attention_hidden_units=(64,),
                 attention_hidden_activations="Dice",
                 attention_output_activation=None, attention_dropout=0.0,
                 din_use_softmax=False, net_dropout=0.0, batch_norm=False,
                 accumulation_steps=1, **kwargs):
        net = _LongDINNet(feature_map, embedding_dim,
                          tuple(dnn_hidden_units), dnn_activations,
                          tuple(attention_hidden_units),
                          attention_hidden_activations,
                          attention_output_activation, attention_dropout,
                          din_use_softmax, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# --------------------------------------------------------------- LongDIEN
class _LongDIENNet(_LongCTRBase):
    """(ref: model_zoo/LongCTR/DIEN/DIEN.py)"""

    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    gru_type: str = "AUGRU"
    enable_sum_pooling: bool = False
    attention_dropout: float = 0.0
    attention_type: str = "bilinear_attention"
    attention_hidden_units: Sequence[int] = (80, 40)
    attention_activation: str = "Dice"
    use_attention_softmax: bool = True
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        sequence_emb = item_emb[:, :-1, :]
        D = sequence_emb.shape[-1]
        interest_emb, _ = MaskedGRU(D, name="extraction")(sequence_emb, mask)
        if self.gru_type == "GRU":
            _, h_out = MaskedGRU(D, name="evolving")(interest_emb, mask)
        else:
            score = self._attn(interest_emb, target_emb, mask, train)
            if self.gru_type == "AIGRU":
                _, h_out = MaskedGRU(D, name="evolving")(
                    interest_emb * score[..., None], mask)
            else:
                h_out = AttentionalGRU(D, self.gru_type, name="evolving")(
                    interest_emb, score, mask)
        concat = emb_list + [target_emb, h_out]
        if self.enable_sum_pooling:
            sp = jnp.einsum("bld,bl->bd", sequence_emb, mask)
            concat += [sp, target_emb * sp]
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(jnp.concatenate(concat, axis=-1),
                                  train=train)
        return {"y_pred": y}

    def _attn(self, seq, target, mask, train):
        D = seq.shape[-1]
        if self.attention_type == "dot_attention":
            score = jnp.einsum("bld,bd->bl", seq, target)
        elif self.attention_type == "bilinear_attention":
            W = self.param("W_kernel", lambda k, s: jnp.eye(s[0]), (D, D))
            score = jnp.einsum("bld,de,be->bl", seq, W, target)
        else:
            t = jnp.broadcast_to(target[:, None, :], seq.shape)
            concat = jnp.concatenate([t, seq, t - seq, t * seq], axis=-1)
            score = MLP_Block(
                hidden_units=tuple(self.attention_hidden_units),
                hidden_activations=self.attention_activation,
                output_dim=1, dropout_rates=self.attention_dropout,
                name="attn_mlp")(concat, train=train)[..., 0]
        score = score * mask
        if self.use_attention_softmax:
            score = jax.nn.softmax(
                jnp.where(mask > 0, score, _NEG_INF), axis=-1)
        return score


@register_model
class LongDIEN(RankModel):
    """DIEN over LongCTR side tables (ref: model_zoo/LongCTR/DIEN/DIEN.py)."""

    _longctr = True

    def __init__(self, feature_map, model_id="LongDIEN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", gru_type="AUGRU",
                 enable_sum_pooling=False, attention_dropout=0.0,
                 attention_type="bilinear_attention",
                 attention_hidden_units=(80, 40), attention_activation="Dice",
                 use_attention_softmax=True, net_dropout=0.0,
                 batch_norm=False, accumulation_steps=1, **kwargs):
        net = _LongDIENNet(feature_map, embedding_dim,
                           tuple(dnn_hidden_units), dnn_activations,
                           gru_type, enable_sum_pooling, attention_dropout,
                           attention_type, tuple(attention_hidden_units),
                           attention_activation, use_attention_softmax,
                           net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------- LongDCNv2
class _LongDCNv2Net(_LongCTRBase):
    """(ref: model_zoo/LongCTR/DCNv2/DCNv2.py): mean-pool the item sequence
    into the flat feature vector, then the standard DCNv2 structures."""

    model_structure: str = "parallel"
    num_cross_layers: int = 3
    stacked_dnn_hidden_units: Sequence[int] = (64, 64)
    parallel_dnn_hidden_units: Sequence[int] = (64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        sequence_emb = item_emb[:, :-1, :]
        pooled = masked_average_pool(sequence_emb, mask)
        x = jnp.concatenate(emb_list + [target_emb, pooled], axis=-1)
        cross_out = CrossNetV2(x.shape[-1], self.num_cross_layers,
                               name="crossnet")(x)
        if self.model_structure == "crossnet_only":
            final = cross_out
        elif self.model_structure == "stacked":
            final = MLP_Block(hidden_units=tuple(self.stacked_dnn_hidden_units),
                              hidden_activations=self.dnn_activations,
                              dropout_rates=self.net_dropout,
                              batch_norm=self.batch_norm,
                              name="stacked_dnn")(cross_out, train=train)
        else:
            deep = MLP_Block(hidden_units=tuple(self.parallel_dnn_hidden_units),
                             hidden_activations=self.dnn_activations,
                             dropout_rates=self.net_dropout,
                             batch_norm=self.batch_norm,
                             name="parallel_dnn")(x, train=train)
            final = jnp.concatenate([cross_out, deep], axis=-1)
        return {"y_pred": _dense(1, "fc")(final)}


@register_model
class LongDCNv2(RankModel):
    """DCNv2 over LongCTR side tables (ref: model_zoo/LongCTR/DCNv2)."""

    _longctr = True

    def __init__(self, feature_map, model_id="LongDCNv2", learning_rate=1e-3,
                 embedding_dim=10, model_structure="parallel",
                 num_cross_layers=3, stacked_dnn_hidden_units=(64, 64),
                 parallel_dnn_hidden_units=(64, 64), dnn_activations="relu",
                 net_dropout=0.0, batch_norm=False, accumulation_steps=1,
                 **kwargs):
        net = _LongDCNv2Net(feature_map, embedding_dim, model_structure,
                            num_cross_layers, tuple(stacked_dnn_hidden_units),
                            tuple(parallel_dnn_hidden_units), dnn_activations,
                            net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------ LongFinalMLP
class _LongFinalMLPNet(_LongCTRBase):
    """(ref: model_zoo/LongCTR/FinalMLP/FinalMLP.py): mean-pooled sequence
    + target into two MLP streams with bilinear fusion."""

    mlp1_hidden_units: Sequence[int] = (64, 64)
    mlp2_hidden_units: Sequence[int] = (64, 64)
    mlp_hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False
    num_heads: int = 1

    @nn.compact
    def __call__(self, batch, train=False):
        from fuxictr_tpu.ops.common import xavier_normal
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        sequence_emb = item_emb[:, :-1, :]
        pooled = masked_average_pool(sequence_emb, mask)
        flat = jnp.concatenate(emb_list + [target_emb, pooled], axis=-1)
        o1 = MLP_Block(hidden_units=tuple(self.mlp1_hidden_units),
                       hidden_activations=self.mlp_hidden_activations,
                       dropout_rates=self.net_dropout,
                       batch_norm=self.batch_norm,
                       name="mlp1")(flat, train=train)
        o2 = MLP_Block(hidden_units=tuple(self.mlp2_hidden_units),
                       hidden_activations=self.mlp_hidden_activations,
                       dropout_rates=self.net_dropout,
                       batch_norm=self.batch_norm,
                       name="mlp2")(flat, train=train)
        H = self.num_heads
        dx, dy = o1.shape[-1] // H, o2.shape[-1] // H
        y = _dense(1, "w_x")(o1) + _dense(1, "w_y")(o2)
        w_xy = self.param("w_xy", xavier_normal(), (H * dx * dy, 1))
        xy = jnp.einsum("bhx,hxy,bhy->bh", o1.reshape(-1, H, dx),
                        w_xy.reshape(H, dx, dy), o2.reshape(-1, H, dy))
        return {"y_pred": y + jnp.sum(xy, axis=1, keepdims=True)}


@register_model
class LongFinalMLP(RankModel):
    """FinalMLP over LongCTR side tables (ref: model_zoo/LongCTR/FinalMLP)."""

    _longctr = True

    def __init__(self, feature_map, model_id="LongFinalMLP",
                 learning_rate=1e-3, embedding_dim=10,
                 mlp1_hidden_units=(64, 64), mlp2_hidden_units=(64, 64),
                 mlp_hidden_activations="relu", net_dropout=0.0,
                 batch_norm=False, num_heads=1, accumulation_steps=1,
                 **kwargs):
        net = _LongFinalMLPNet(feature_map, embedding_dim,
                               tuple(mlp1_hidden_units),
                               tuple(mlp2_hidden_units),
                               mlp_hidden_activations, net_dropout,
                               batch_norm, num_heads)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------ LongTransAct
class _LongTransActNet(_LongCTRBase):
    """(ref: model_zoo/LongCTR/TransAct/TransAct.py): transformer over
    [seq ‖ target] + DCNv2-parallel head."""

    hidden_activations: Union[str, Sequence[str]] = "relu"
    dcn_cross_layers: int = 3
    dcn_hidden_units: Sequence[int] = (256, 128, 64)
    mlp_hidden_units: Sequence[int] = ()
    num_heads: int = 1
    transformer_layers: int = 1
    transformer_dropout: float = 0.0
    dim_feedforward: int = 512
    first_k_cols: int = 1
    concat_max_pool: bool = True
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        sequence_emb = item_emb[:, :-1, :]
        L = sequence_emb.shape[1]
        valid = mask > 0
        all_empty = ~jnp.any(valid, axis=1)
        valid = valid.at[:, -1].set(valid[:, -1] | all_empty)
        x = jnp.concatenate(
            [sequence_emb,
             jnp.broadcast_to(target_emb[:, None, :],
                              (sequence_emb.shape[0], L,
                               target_emb.shape[-1]))], axis=-1)
        for i in range(self.transformer_layers):
            x = TransformerEncoderLayer(
                model_dim=x.shape[-1], num_heads=self.num_heads,
                ff_dim=self.dim_feedforward,
                dropout_rate=self.transformer_dropout,
                name=f"transformer_{i}")(x, mask=valid, train=train)
        x = x * valid[..., None].astype(x.dtype)
        out = [x[:, -self.first_k_cols:, :].reshape(x.shape[0], -1)]
        if self.concat_max_pool:
            xm = jnp.where(valid[..., None], x, _NEG_INF)
            out.append(_dense(x.shape[-1], "out_linear")(jnp.max(xm, axis=1)))
        dcn_in = jnp.concatenate(
            emb_list + [target_emb] + out, axis=-1)
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
class LongTransAct(RankModel):
    """TransAct over LongCTR side tables (ref: model_zoo/LongCTR/TransAct)."""

    _longctr = True

    def __init__(self, feature_map, model_id="LongTransAct",
                 learning_rate=1e-3, embedding_dim=10,
                 hidden_activations="relu", dcn_cross_layers=3,
                 dcn_hidden_units=(256, 128, 64), mlp_hidden_units=(),
                 num_heads=1, transformer_layers=1, transformer_dropout=0.0,
                 dim_feedforward=512, first_k_cols=1, concat_max_pool=True,
                 net_dropout=0.0, batch_norm=False, accumulation_steps=1,
                 **kwargs):
        net = _LongTransActNet(feature_map, embedding_dim,
                               hidden_activations, dcn_cross_layers,
                               tuple(dcn_hidden_units),
                               tuple(mlp_hidden_units), num_heads,
                               transformer_layers, transformer_dropout,
                               dim_feedforward, first_k_cols,
                               concat_max_pool, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
