"""Feature-interaction ranking models, tranche 2: the FM family.

FFM/FFMv2, HOFM, FwFM, FmFM, LorentzFM, AFM, NFM, HFM, PNN, ONN/ONNv2.
Each class cites its reference parity target; all interaction math is
batched dense algebra over static triu pair indices (MXU-friendly).
"""

from itertools import combinations
from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.blocks import LogisticRegression
from fuxictr_tpu.ops.common import xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.interactions import (HolographicInteraction,
                                          InnerProductInteraction,
                                          _triu_pairs)
from fuxictr_tpu.ops.mlp import MLP_Block


def _flat(x):
    return x.reshape(x.shape[0], -1)


# -------------------------------------------------------------------- FFM
class _FFMNet(nn.Module):
    """Field-aware FM (ref: model_zoo/FFM/src/FFMv2.py:24-91): each field
    carries F-1 per-target-field embeddings; pair (i<j) scores
    <v_i→j, v_j→i>. One fused [B, F, F-1, D] embedding tensor."""

    feature_map: Any
    embedding_dim: int = 2

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        D = self.embedding_dim
        lr = LogisticRegression(self.feature_map, use_bias=True,
                                name="embedding_lr")(batch)
        fwe = FeatureEmbedding(self.feature_map, D * (F - 1),
                               name="embedding")(batch)
        fwe = fwe.reshape(-1, F, F - 1, D)
        p, q = _triu_pairs(F)
        left = fwe[:, p, q - 1, :]       # v_{i → j}
        right = fwe[:, q, p, :]          # v_{j → i}
        ffm = jnp.sum(left * right, axis=(1, 2))[:, None]
        return {"y_pred": lr + ffm}


@register_model
class FFM(RankModel):
    """FFM (ref: model_zoo/FFM/src/FFM.py; vectorized FFMv2 formulation)."""

    def __init__(self, feature_map, model_id="FFM", learning_rate=1e-3,
                 embedding_dim=2, regularizer=None, **kwargs):
        kwargs.setdefault("embedding_regularizer", regularizer)
        kwargs.setdefault("net_regularizer", regularizer)
        net = _FFMNet(feature_map, embedding_dim)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


@register_model
class FFMv2(FFM):
    """FFMv2 (ref: model_zoo/FFM/src/FFMv2.py:24-91) — same math, single
    fused field-wise embedding tensor."""

    def __init__(self, feature_map, model_id="FFMv2", **kwargs):
        super().__init__(feature_map, model_id=model_id, **kwargs)


# ------------------------------------------------------------------- HOFM
class _HOFMNet(nn.Module):
    """Higher-order FM (ref: model_zoo/HOFM/src/HOFM.py:30-120): LR + FM
    order-2 + hadamard-product sums for orders 3..k, optionally separate
    embeddings per order."""

    feature_map: Any
    embedding_dim: Union[int, Sequence[int]] = 10
    order: int = 3
    reuse_embedding: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        y = LogisticRegression(self.feature_map, use_bias=True,
                               name="embedding_lr")(batch)
        dims = self.embedding_dim
        if not isinstance(dims, (list, tuple)):
            dims = [dims] * (self.order - 1)
        if self.reuse_embedding:
            embs = [FeatureEmbedding(self.feature_map, dims[0],
                                     name="embedding")(batch)] * (self.order - 1)
        else:
            embs = [FeatureEmbedding(self.feature_map, dims[i],
                                     name=f"embedding_{i}")(batch)
                    for i in range(self.order - 1)]
        y = y + InnerProductInteraction(F, output="product_sum")(embs[0])
        for order_i in range(3, self.order + 1):
            emb = embs[order_i - 2]
            idx = np.array(list(combinations(range(F), order_i)))  # [C, k]
            prod = emb[:, idx[:, 0], :]
            for k in range(1, order_i):
                prod = prod * emb[:, idx[:, k], :]
            y = y + jnp.sum(prod, axis=(1, 2))[:, None]
        return {"y_pred": y}


@register_model
class HOFM(RankModel):
    """HOFM (ref: model_zoo/HOFM/src/HOFM.py:30-120)."""

    def __init__(self, feature_map, model_id="HOFM", learning_rate=1e-3,
                 order=3, embedding_dim=10, reuse_embedding=False,
                 regularizer=None, **kwargs):
        assert order >= 2, "order >= 2 is required in HOFM!"
        kwargs.setdefault("embedding_regularizer", regularizer)
        kwargs.setdefault("net_regularizer", regularizer)
        net = _HOFMNet(feature_map, embedding_dim, order, reuse_embedding)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- FwFM
class _FwFMNet(nn.Module):
    """Field-weighted FM (ref: model_zoo/FwFM/src/FwFM.py:25-100): learned
    per-pair interaction weights + one of 3 linear terms (LW/FeLV/FiLV)."""

    feature_map: Any
    embedding_dim: int = 10
    linear_type: str = "FiLV"

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        inner = InnerProductInteraction(F, output="inner_product")(emb)
        poly2 = nn.Dense(1, kernel_init=xavier_normal(), bias_init=zeros_init,
                         name="interaction_weight")(inner)
        if self.linear_type == "LW":
            lw = FeatureEmbedding(self.feature_map, 1, force_dim=1,
                                  use_pretrain=False, pool_sequences="sum",
                                  name="embedding_lw")(batch)
            linear = jnp.sum(lw, axis=(1, 2))[:, None]
        elif self.linear_type == "FeLV":
            lw = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                  name="embedding_felv")(batch)
            linear = jnp.sum(emb * lw, axis=(1, 2))[:, None]
        elif self.linear_type == "FiLV":
            linear = nn.Dense(1, use_bias=False, kernel_init=xavier_normal(),
                              name="filv")(_flat(emb))
        else:
            raise NotImplementedError(
                f"linear_type={self.linear_type} is not supported.")
        return {"y_pred": poly2 + linear}


@register_model
class FwFM(RankModel):
    """FwFM (ref: model_zoo/FwFM/src/FwFM.py:25-100)."""

    def __init__(self, feature_map, model_id="FwFM", learning_rate=1e-3,
                 embedding_dim=10, linear_type="FiLV", regularizer=None,
                 **kwargs):
        kwargs.setdefault("embedding_regularizer", regularizer)
        kwargs.setdefault("net_regularizer", regularizer)
        net = _FwFMNet(feature_map, embedding_dim, linear_type)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- FmFM
class _FmFMNet(nn.Module):
    """Field-matrixed FM (ref: model_zoo/FmFM/src/FmFM.py:25-105): per-pair
    vector ("vectorized") or matrix ("matrixed") transform of the left
    embedding before the pair inner product; plus LR."""

    feature_map: Any
    embedding_dim: int = 10
    field_interaction_type: str = "matrixed"

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        D = self.embedding_dim
        emb = FeatureEmbedding(self.feature_map, D, name="embedding")(batch)
        p, q = _triu_pairs(F)
        left, right = emb[:, p], emb[:, q]
        n_pairs = len(p)
        if self.field_interaction_type == "vectorized":
            W = self.param("interaction_weight", xavier_normal(), (n_pairs, D))
            left = left * W[None]
        elif self.field_interaction_type == "matrixed":
            W = self.param("interaction_weight", xavier_normal(),
                           (n_pairs, D, D))
            left = jnp.einsum("bpd,pde->bpe", left, W)
        else:
            raise ValueError(
                f"field_interaction_type={self.field_interaction_type}")
        y = jnp.sum(left * right, axis=(1, 2))[:, None]
        y = y + LogisticRegression(self.feature_map, name="embedding_lr")(batch)
        return {"y_pred": y}


@register_model
class FmFM(RankModel):
    """FmFM (ref: model_zoo/FmFM/src/FmFM.py:25-105)."""

    def __init__(self, feature_map, model_id="FmFM", learning_rate=1e-3,
                 embedding_dim=10, field_interaction_type="matrixed",
                 regularizer=None, **kwargs):
        kwargs.setdefault("embedding_regularizer", regularizer)
        kwargs.setdefault("net_regularizer", regularizer)
        net = _FmFMNet(feature_map, embedding_dim, field_interaction_type)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------- LorentzFM
class _LorentzFMNet(nn.Module):
    """LorentzFM (ref: model_zoo/LorentzFM/src/LorentzFM.py:24-110):
    triangle pooling of Lorentz distances,
    T(u,v) = 1 + (1 − <u,v> − u0 − v0)/(u0 v0), u0 = sqrt(|u|²+1)."""

    feature_map: Any
    embedding_dim: int = 10

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        inner = InnerProductInteraction(F, output="inner_product")(emb)
        zeroth = jnp.sqrt(jnp.sum(emb ** 2, axis=-1) + 1.0)   # [B, F]
        p, q = _triu_pairs(F)
        u0, v0 = zeroth[:, p], zeroth[:, q]
        score = 1.0 + (1.0 - inner - u0 - v0) / (u0 * v0)
        return {"y_pred": jnp.sum(score, axis=1, keepdims=True)}


@register_model
class LorentzFM(RankModel):
    """LorentzFM (ref: model_zoo/LorentzFM/src/LorentzFM.py:24-110)."""

    def __init__(self, feature_map, model_id="LorentzFM", learning_rate=1e-3,
                 embedding_dim=10, regularizer=None, **kwargs):
        kwargs.setdefault("embedding_regularizer", regularizer)
        kwargs.setdefault("net_regularizer", regularizer)
        net = _LorentzFMNet(feature_map, embedding_dim)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- AFM
class _AFMNet(nn.Module):
    """Attentional FM (ref: model_zoo/AFM/src/AFM.py:26-115): attention
    softmax over pairwise hadamard products, projected to a scalar."""

    feature_map: Any
    embedding_dim: int = 10
    attention_dim: int = 10
    attention_dropout: Sequence[float] = (0.0, 0.0)
    use_attention: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        ew = InnerProductInteraction(F, output="elementwise_product")(emb)
        lr = LogisticRegression(self.feature_map, use_bias=True,
                                name="embedding_lr")(batch)
        if self.use_attention:
            a = nn.Dense(self.attention_dim, kernel_init=xavier_normal(),
                         bias_init=zeros_init, name="attention_1")(ew)
            a = jax.nn.relu(a)
            a = nn.Dense(1, use_bias=False, kernel_init=xavier_normal(),
                         name="attention_2")(a)
            a = jax.nn.softmax(a, axis=1)                     # over pairs
            a = nn.Dropout(self.attention_dropout[0],
                           deterministic=not train)(a)
            s = jnp.sum(a * ew, axis=1)
            s = nn.Dropout(self.attention_dropout[1],
                           deterministic=not train)(s)
            afm = nn.Dense(1, use_bias=False, kernel_init=xavier_normal(),
                           name="weight_p")(s)
        else:
            afm = jnp.sum(_flat(ew), axis=-1, keepdims=True)
        return {"y_pred": lr + afm}


@register_model
class AFM(RankModel):
    """AFM (ref: model_zoo/AFM/src/AFM.py:26-115)."""

    def __init__(self, feature_map, model_id="AFM", learning_rate=1e-3,
                 embedding_dim=10, attention_dim=10,
                 attention_dropout=(0, 0), use_attention=True, **kwargs):
        net = _AFMNet(feature_map, embedding_dim, attention_dim,
                      tuple(attention_dropout), use_attention)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- NFM
class _NFMNet(nn.Module):
    """Neural FM (ref: model_zoo/NFM/src/NFM.py:25-100): LR +
    DNN(bi-interaction pooling vector)."""

    feature_map: Any
    embedding_dim: int = 10
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        y = LogisticRegression(self.feature_map, use_bias=False,
                               name="embedding_lr")(batch)
        bi = InnerProductInteraction(F, output="bi_interaction")(emb)
        y = y + MLP_Block(hidden_units=tuple(self.hidden_units),
                          hidden_activations=self.hidden_activations,
                          output_dim=1, dropout_rates=self.net_dropout,
                          batch_norm=self.batch_norm,
                          name="dnn")(bi, train=train)
        return {"y_pred": y}


@register_model
class NFM(RankModel):
    """NFM (ref: model_zoo/NFM/src/NFM.py:25-100)."""

    def __init__(self, feature_map, model_id="NFM", learning_rate=1e-3,
                 embedding_dim=10, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 **kwargs):
        net = _NFMNet(feature_map, embedding_dim, tuple(hidden_units),
                      hidden_activations, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- HFM
class _HFMNet(nn.Module):
    """Holographic FM (ref: model_zoo/HFM/src/HFM.py:27-120): LR + pairwise
    holographic interactions → DNN (HFM+) or linear projection."""

    feature_map: Any
    embedding_dim: int = 10
    interaction_type: str = "circular_convolution"
    use_dnn: bool = True
    hidden_units: Sequence[int] = (64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        interact = HolographicInteraction(
            F, interaction_type=self.interaction_type, name="hfm")(emb)
        if self.use_dnn:
            out = MLP_Block(hidden_units=tuple(self.hidden_units),
                            hidden_activations=self.hidden_activations,
                            output_dim=1, dropout_rates=self.net_dropout,
                            batch_norm=self.batch_norm,
                            name="dnn")(_flat(interact), train=train)
        else:
            out = nn.Dense(1, use_bias=False, kernel_init=xavier_normal(),
                           name="proj_h")(jnp.sum(interact, axis=1))
        y = out + LogisticRegression(self.feature_map,
                                     name="embedding_lr")(batch)
        return {"y_pred": y}


@register_model
class HFM(RankModel):
    """HFM (ref: model_zoo/HFM/src/HFM.py:27-120)."""

    def __init__(self, feature_map, model_id="HFM", learning_rate=1e-3,
                 embedding_dim=10, interaction_type="circular_convolution",
                 use_dnn=True, hidden_units=(64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 **kwargs):
        net = _HFMNet(feature_map, embedding_dim, interaction_type, use_dnn,
                      tuple(hidden_units), hidden_activations, net_dropout,
                      batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- PNN
class _PNNNet(nn.Module):
    """Product-based NN (ref: model_zoo/PNN/src/PNN.py:24-95): DNN over
    [flat embeddings, pairwise inner products]."""

    feature_map: Any
    embedding_dim: int = 10
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False
    product_type: str = "inner"

    @nn.compact
    def __call__(self, batch, train=False):
        if self.product_type != "inner":
            raise NotImplementedError(
                f"product_type={self.product_type} is not supported.")
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        inner = InnerProductInteraction(F, output="inner_product")(emb)
        dense_in = jnp.concatenate([_flat(emb), inner], axis=1)
        y = MLP_Block(hidden_units=tuple(self.hidden_units),
                      hidden_activations=self.hidden_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(dense_in, train=train)
        return {"y_pred": y}


@register_model
class PNN(RankModel):
    """PNN (ref: model_zoo/PNN/src/PNN.py:24-95)."""

    def __init__(self, feature_map, model_id="PNN", learning_rate=1e-3,
                 embedding_dim=10, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 product_type="inner", **kwargs):
        net = _PNNNet(feature_map, embedding_dim, tuple(hidden_units),
                      hidden_activations, net_dropout, batch_norm,
                      product_type)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- ONN
class _ONNNet(nn.Module):
    """Operation-aware NN (ref: model_zoo/ONN/ONN_torch/src/ONNv2.py:25-109):
    field-wise [B, F, F, D] embeddings; DNN over [diagonal embeddings,
    pairwise field-aware inner products]."""

    feature_map: Any
    embedding_dim: int = 2
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        D = self.embedding_dim
        fwe = FeatureEmbedding(self.feature_map, D * F,
                               name="embedding")(batch)
        fwe = fwe.reshape(-1, F, F, D)
        diag = fwe[:, jnp.arange(F), jnp.arange(F), :]        # [B, F, D]
        p, q = _triu_pairs(F)
        ffm_out = jnp.sum(fwe[:, q, p, :] * fwe[:, p, q, :], axis=-1)
        dnn_in = jnp.concatenate([_flat(diag), ffm_out], axis=1)
        y = MLP_Block(hidden_units=tuple(self.hidden_units),
                      hidden_activations=self.hidden_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(dnn_in, train=train)
        return {"y_pred": y}


@register_model
class ONN(RankModel):
    """ONN (ref: model_zoo/ONN/ONN_torch/src/ONN.py; v2 formulation)."""

    def __init__(self, feature_map, model_id="ONN", learning_rate=1e-3,
                 embedding_dim=2, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 **kwargs):
        net = _ONNNet(feature_map, embedding_dim, tuple(hidden_units),
                      hidden_activations, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


@register_model
class ONNv2(ONN):
    """ONNv2 (ref: model_zoo/ONN/ONN_torch/src/ONNv2.py:25-109)."""

    def __init__(self, feature_map, model_id="ONNv2", **kwargs):
        super().__init__(feature_map, model_id=model_id, **kwargs)
