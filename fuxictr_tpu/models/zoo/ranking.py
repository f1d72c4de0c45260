"""Feature-interaction ranking models (first tranche).

Each model = a compact flax net returning ``{"y_pred": logits}`` plus a thin
RankModel wrapper exposing the reference's constructor surface (parity
targets cited per class). Nets consume the raw batch dict; embeddings come
from the fused-table FeatureEmbedding.
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.blocks import (FactorizationMachine, LogisticRegression,
                                    fm_pairwise_sum)
from fuxictr_tpu.ops.common import xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.interactions import (CompressedInteractionNet, CrossNet,
                                          CrossNetMix, CrossNetV2,
                                          InnerProductInteraction,
                                          SqueezeExcitation,
                                          BilinearInteraction,
                                          HolographicInteraction,
                                          InteractionMachine)
from fuxictr_tpu.ops.attention import MultiHeadSelfAttention
from fuxictr_tpu.ops.mlp import MLP_Block


def _flat(x):
    return x.reshape(x.shape[0], -1)


# --------------------------------------------------------------------- LR
class _LRNet(nn.Module):
    feature_map: Any
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        y = LogisticRegression(self.feature_map, use_bias=self.use_bias,
                               name="embedding_lr")(batch)
        return {"y_pred": y}


@register_model
class LR(RankModel):
    """Logistic regression (ref: model_zoo/LR)."""

    def __init__(self, feature_map, model_id="LR", learning_rate=1e-3,
                 regularizer=None, **kwargs):
        kwargs.setdefault("embedding_regularizer", regularizer)
        net = _LRNet(feature_map)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# --------------------------------------------------------------------- FM
class _FMNet(nn.Module):
    feature_map: Any
    embedding_dim: int = 10

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        y = FactorizationMachine(self.feature_map, name="fm")(batch, emb)
        return {"y_pred": y}


@register_model
class FM(RankModel):
    """Factorization machine (ref: model_zoo/FM)."""

    def __init__(self, feature_map, model_id="FM", learning_rate=1e-3,
                 embedding_dim=10, regularizer=None, **kwargs):
        kwargs.setdefault("embedding_regularizer", regularizer)
        net = _FMNet(feature_map, embedding_dim)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- DNN
class _DNNNet(nn.Module):
    feature_map: Any
    embedding_dim: int = 10
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        y = MLP_Block(hidden_units=tuple(self.hidden_units),
                      hidden_activations=self.hidden_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm, name="mlp")(emb, train=train)
        return {"y_pred": y}


@register_model
class DNN(RankModel):
    """Plain deep model (ref: model_zoo/DNN)."""

    def __init__(self, feature_map, model_id="DNN", learning_rate=1e-3,
                 embedding_dim=10, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 **kwargs):
        net = _DNNNet(feature_map, embedding_dim, tuple(hidden_units),
                      hidden_activations, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# --------------------------------------------------------------- WideDeep
class _WideDeepNet(nn.Module):
    feature_map: Any
    embedding_dim: int = 10
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        wide = LogisticRegression(self.feature_map, use_bias=False,
                                  name="embedding_wide")(batch)
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        deep = MLP_Block(hidden_units=tuple(self.hidden_units),
                         hidden_activations=self.hidden_activations,
                         output_dim=1, dropout_rates=self.net_dropout,
                         batch_norm=self.batch_norm, name="mlp")(emb, train=train)
        return {"y_pred": wide + deep}


@register_model
class WideDeep(RankModel):
    """Wide & Deep (ref: model_zoo/WideDeep)."""

    def __init__(self, feature_map, model_id="WideDeep", learning_rate=1e-3,
                 embedding_dim=10, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 **kwargs):
        net = _WideDeepNet(feature_map, embedding_dim, tuple(hidden_units),
                           hidden_activations, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ----------------------------------------------------------------- DeepFM
class _DeepFMNet(nn.Module):
    feature_map: Any
    embedding_dim: int = 10
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)        # [B, F, D]
        y = FactorizationMachine(self.feature_map, name="fm")(batch, emb)
        y = y + MLP_Block(hidden_units=tuple(self.hidden_units),
                          hidden_activations=self.hidden_activations,
                          output_dim=1, dropout_rates=self.net_dropout,
                          batch_norm=self.batch_norm,
                          name="mlp")(_flat(emb), train=train)
        return {"y_pred": y}


@register_model
class DeepFM(RankModel):
    """DeepFM (ref: model_zoo/DeepFM/DeepFM_torch/src/DeepFM.py:24-88)."""

    def __init__(self, feature_map, model_id="DeepFM", learning_rate=1e-3,
                 embedding_dim=10, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 **kwargs):
        net = _DeepFMNet(feature_map, embedding_dim, tuple(hidden_units),
                         hidden_activations, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- DCN
class _DCNNet(nn.Module):
    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    crossing_layers: int = 3
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        input_dim = emb.shape[-1]
        cross = CrossNet(input_dim, self.crossing_layers, name="crossnet")(emb)
        parts = [cross]
        if self.dnn_hidden_units:
            deep = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                             hidden_activations=self.dnn_activations,
                             dropout_rates=self.net_dropout,
                             batch_norm=self.batch_norm,
                             name="dnn")(emb, train=train)
            parts.append(deep)
        final = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
        y = nn.Dense(1, kernel_init=xavier_normal(), bias_init=zeros_init,
                     name="fc")(final)
        return {"y_pred": y}


@register_model
class DCN(RankModel):
    """Deep & Cross Network (ref: model_zoo/DCN)."""

    def __init__(self, feature_map, model_id="DCN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(64, 64, 64),
                 dnn_activations="relu", crossing_layers=3, net_dropout=0.0,
                 batch_norm=False, **kwargs):
        net = _DCNNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                      dnn_activations, crossing_layers, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------ DCNv2
class _DCNv2Net(nn.Module):
    """Supports the 4 reference structures (model_zoo/DCNv2/src/DCNv2.py:23-133):
    crossnet_only | stacked | parallel | stacked_parallel, and the
    mixed low-rank cross (use_low_rank_mixture)."""

    feature_map: Any
    embedding_dim: int = 10
    model_structure: str = "parallel"
    use_low_rank_mixture: bool = False
    low_rank: int = 32
    num_experts: int = 4
    num_cross_layers: int = 3
    stacked_dnn_hidden_units: Sequence[int] = ()
    parallel_dnn_hidden_units: Sequence[int] = ()
    dnn_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        input_dim = emb.shape[-1]
        if self.use_low_rank_mixture:
            cross_out = CrossNetMix(input_dim, self.num_cross_layers,
                                    self.low_rank, self.num_experts,
                                    name="crossnet")(emb)
        else:
            cross_out = CrossNetV2(input_dim, self.num_cross_layers,
                                   name="crossnet")(emb)
        if self.model_structure == "crossnet_only":
            final = cross_out
        elif self.model_structure == "stacked":
            final = MLP_Block(hidden_units=tuple(self.stacked_dnn_hidden_units),
                              hidden_activations=self.dnn_activations,
                              dropout_rates=self.net_dropout,
                              batch_norm=self.batch_norm,
                              name="stacked_dnn")(cross_out, train=train)
        elif self.model_structure == "parallel":
            deep = MLP_Block(hidden_units=tuple(self.parallel_dnn_hidden_units),
                             hidden_activations=self.dnn_activations,
                             dropout_rates=self.net_dropout,
                             batch_norm=self.batch_norm,
                             name="parallel_dnn")(emb, train=train)
            final = jnp.concatenate([cross_out, deep], axis=-1)
        elif self.model_structure == "stacked_parallel":
            stacked = MLP_Block(
                hidden_units=tuple(self.stacked_dnn_hidden_units),
                hidden_activations=self.dnn_activations,
                dropout_rates=self.net_dropout, batch_norm=self.batch_norm,
                name="stacked_dnn")(cross_out, train=train)
            deep = MLP_Block(
                hidden_units=tuple(self.parallel_dnn_hidden_units),
                hidden_activations=self.dnn_activations,
                dropout_rates=self.net_dropout, batch_norm=self.batch_norm,
                name="parallel_dnn")(emb, train=train)
            final = jnp.concatenate([stacked, deep], axis=-1)
        else:
            raise ValueError(
                f"model_structure={self.model_structure} not supported.")
        y = nn.Dense(1, kernel_init=xavier_normal(), bias_init=zeros_init,
                     name="fc")(final)
        return {"y_pred": y}


@register_model
class DCNv2(RankModel):
    """DCNv2 (ref: model_zoo/DCNv2/src/DCNv2.py:23-133)."""

    def __init__(self, feature_map, model_id="DCNv2", learning_rate=1e-3,
                 embedding_dim=10, model_structure="parallel",
                 use_low_rank_mixture=False, low_rank=32, num_experts=4,
                 num_cross_layers=3, stacked_dnn_hidden_units=(),
                 parallel_dnn_hidden_units=(), dnn_activations="relu",
                 net_dropout=0.0, batch_norm=False, **kwargs):
        net = _DCNv2Net(feature_map, embedding_dim, model_structure,
                        use_low_rank_mixture, low_rank, num_experts,
                        num_cross_layers, tuple(stacked_dnn_hidden_units),
                        tuple(parallel_dnn_hidden_units), dnn_activations,
                        net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- xDeepFM
class _xDeepFMNet(nn.Module):
    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    cin_hidden_units: Sequence[int] = (16, 16, 16)
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb = emb_layer(batch)                               # [B, F, D]
        lr = LogisticRegression(self.feature_map, use_bias=False,
                                name="embedding_lr")(batch)
        y = lr + CompressedInteractionNet(
            emb.shape[1], tuple(self.cin_hidden_units), output_dim=1,
            name="cin")(emb)
        if self.dnn_hidden_units:
            y = y + MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                              hidden_activations=self.dnn_activations,
                              output_dim=1, dropout_rates=self.net_dropout,
                              batch_norm=self.batch_norm,
                              name="dnn")(_flat(emb), train=train)
        return {"y_pred": y}


@register_model
class xDeepFM(RankModel):
    """xDeepFM with CIN (ref: model_zoo/xDeepFM)."""

    def __init__(self, feature_map, model_id="xDeepFM", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(64, 64, 64),
                 dnn_activations="relu", cin_hidden_units=(16, 16, 16),
                 net_dropout=0.0, batch_norm=False, **kwargs):
        net = _xDeepFMNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                          dnn_activations, tuple(cin_hidden_units),
                          net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- AutoInt
class _AutoIntNet(nn.Module):
    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_layers: int = 2
    num_heads: int = 1
    attention_dim: int = 8
    use_residual: bool = True
    use_scale: bool = False
    use_wide: bool = False
    layer_norm: bool = False
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)       # [B, F, D]
        x = emb
        for i in range(self.attention_layers):
            x = MultiHeadSelfAttention(
                input_dim=x.shape[-1], attention_dim=self.attention_dim,
                num_heads=self.num_heads, dropout_rate=self.net_dropout,
                use_residual=self.use_residual, use_scale=self.use_scale,
                layer_norm=self.layer_norm, name=f"self_attention_{i}")(
                    x, train=train)
        y = nn.Dense(1, kernel_init=xavier_normal(), bias_init=zeros_init,
                     name="attn_fc")(_flat(x))
        if self.dnn_hidden_units:
            y = y + MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                              hidden_activations=self.dnn_activations,
                              output_dim=1, dropout_rates=self.net_dropout,
                              batch_norm=self.batch_norm,
                              name="dnn")(_flat(emb), train=train)
        if self.use_wide:
            y = y + LogisticRegression(self.feature_map, use_bias=False,
                                       name="embedding_lr")(batch)
        return {"y_pred": y}


@register_model
class AutoInt(RankModel):
    """AutoInt (ref: model_zoo/AutoInt/src/AutoInt.py:25-190)."""

    def __init__(self, feature_map, model_id="AutoInt", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(64, 64, 64),
                 dnn_activations="relu", attention_layers=2, num_heads=1,
                 attention_dim=8, use_residual=True, use_scale=False,
                 use_wide=False, layer_norm=False, net_dropout=0.0,
                 batch_norm=False, **kwargs):
        net = _AutoIntNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                          dnn_activations, attention_layers, num_heads,
                          attention_dim, use_residual, use_scale, use_wide,
                          layer_norm, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
