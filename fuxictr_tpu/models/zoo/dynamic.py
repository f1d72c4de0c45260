"""Dynamic-weight models: PPNet (PEPNet) and APG.

PPNet: GateNU gates conditioned on prior features rescale each MLP hidden
layer. APG: a hypernetwork generates (low-rank) per-example MLP weights.
Reference parity targets cited per class.
"""

from typing import Any, Dict, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.blocks import FactorizationMachine
from fuxictr_tpu.ops.common import Activation, xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.interactions import CrossNetV2
from fuxictr_tpu.ops.mlp import MLP_Block


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _dense(units, name, use_bias=True):
    return nn.Dense(units, use_bias=use_bias, kernel_init=xavier_normal(),
                    bias_init=zeros_init, name=name)


# ------------------------------------------------------------------ PPNet
class _GateNU(nn.Module):
    """(ref: model_zoo/PEPNet/src/PPNet.py:24-60): 2·sigmoid bottleneck."""

    output_dim: int
    hidden_dim: int = None
    hidden_activation: str = "relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        hidden = self.hidden_dim or self.output_dim
        h = _dense(hidden, "fc1")(x)
        h = Activation(self.hidden_activation,
                       hidden_dim=hidden)(h, train=train)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return jax.nn.sigmoid(_dense(self.output_dim, "fc2")(h)) * 2


class _PPNetNet(nn.Module):
    """PPNet (ref: model_zoo/PEPNet/src/PPNet.py:61-230): each MLP hidden
    layer's output is rescaled by a GateNU fed [stop_grad(features), gate
    prior embeddings]."""

    feature_map: Any
    embedding_dim: int = 10
    gate_emb_dim: int = 10
    gate_priors: Sequence[str] = ()
    gate_hidden_dim: int = 64
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        gate_emb = FeatureEmbedding(
            self.feature_map, self.gate_emb_dim,
            required_feature_columns=tuple(self.gate_priors),
            name="gate_embedding")(batch, flatten_emb=True) \
            if self.gate_priors else jnp.zeros((emb.shape[0], 0))
        gate_input = jnp.concatenate(
            [jax.lax.stop_gradient(emb), gate_emb], axis=-1)
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * len(self.hidden_units)
        h = emb
        for i, units in enumerate(self.hidden_units):
            h = _dense(units, f"mlp_{i}")(h)
            if self.batch_norm:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"bn_{i}")(h)
            h = Activation(acts[i], hidden_dim=units)(h, train=train)
            if self.net_dropout > 0:
                h = nn.Dropout(self.net_dropout, deterministic=not train)(h)
            gate = _GateNU(units, self.gate_hidden_dim,
                           name=f"gate_{i}")(gate_input, train=train)
            h = h * gate
        return {"y_pred": _dense(1, "fc")(h)}


@register_model
class PPNet(RankModel):
    """PPNet/PEPNet (ref: model_zoo/PEPNet/src/PPNet.py:24-230)."""

    def __init__(self, feature_map, model_id="PPNet", learning_rate=1e-3,
                 embedding_dim=10, gate_emb_dim=10, gate_priors=(),
                 gate_hidden_dim=64, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0,
                 batch_norm=False, **kwargs):
        net = _PPNetNet(feature_map, embedding_dim, gate_emb_dim,
                        tuple(gate_priors), gate_hidden_dim,
                        tuple(hidden_units), hidden_activations, net_dropout,
                        batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


@register_model
class PEPNet(PPNet):
    """Alias — the reference ships PPNet as the PEPNet implementation."""

    def __init__(self, feature_map, model_id="PEPNet", **kwargs):
        super().__init__(feature_map, model_id=model_id, **kwargs)


# -------------------------------------------------------------------- APG
class _APGLinear(nn.Module):
    """(ref: model_zoo/APG/src/APG.py:24-128): hypernet-generated linear.

    Low-rank: out = ((x U) S(z)) V with S(z) [B, k, k] from the hypernet;
    optional over-parameterized U/V factorization; optional generated bias.
    """

    input_dim: int
    output_dim: int
    condition_dim: int
    use_bias: bool = True
    rank_k: int = None
    overparam_p: int = None
    generate_bias: bool = True
    hypernet_config: Dict = None

    @nn.compact
    def __call__(self, x, condition_z):
        cfg = self.hypernet_config or {}
        use_low_rank = self.rank_k is not None
        out_extra = self.output_dim if (self.generate_bias and self.use_bias) \
            else 0
        hyper_out_dim = (self.rank_k ** 2 if use_low_rank
                         else self.input_dim * self.output_dim) + out_extra
        weight_S = MLP_Block(
            hidden_units=tuple(cfg.get("hidden_units", ())),
            hidden_activations=cfg.get("hidden_activations", "relu"),
            output_dim=hyper_out_dim,
            dropout_rates=cfg.get("dropout_rates", 0.0),
            name="hypernet")(condition_z)
        if out_extra:
            bias = weight_S[:, :self.output_dim]
            weight_S = weight_S[:, self.output_dim:]
        elif self.use_bias:
            bias = self.param("bias", zeros_init, (1, self.output_dim))
        else:
            bias = None
        if use_low_rank:
            S = weight_S.reshape(-1, self.rank_k, self.rank_k)
            if self.overparam_p is not None:
                U = (self.param("U_l", xavier_normal(),
                                (self.input_dim, self.overparam_p))
                     @ self.param("U_r", xavier_normal(),
                                  (self.overparam_p, self.rank_k)))
                V = (self.param("V_l", xavier_normal(),
                                (self.rank_k, self.overparam_p))
                     @ self.param("V_r", xavier_normal(),
                                  (self.overparam_p, self.output_dim)))
            else:
                U = self.param("U", xavier_normal(),
                               (self.input_dim, self.rank_k))
                V = self.param("V", xavier_normal(),
                               (self.rank_k, self.output_dim))
            h = x @ U
            h = jnp.einsum("bk,bkq->bq", h, S)
            out = h @ V
        else:
            W = weight_S.reshape(-1, self.input_dim, self.output_dim)
            out = jnp.einsum("bi,bio->bo", x, W)
        if bias is not None:
            out = out + bias
        return out


class _APGMLP(nn.Module):
    """(ref: model_zoo/APG/src/APG.py:129-260)"""

    hidden_units: Sequence[int]
    hidden_activations: Union[str, Sequence[str]] = "relu"
    output_dim: int = 1
    dropout_rates: float = 0.0
    batch_norm: bool = False
    condition_mode: str = "self-wise"
    condition_dim: int = None
    rank_k: int = None
    overparam_p: int = None
    generate_bias: bool = True
    hypernet_config: Dict = None

    @nn.compact
    def __call__(self, x, condition_z=None, train=False):
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * len(self.hidden_units)
        h = x
        for i, units in enumerate(self.hidden_units):
            cond = h if self.condition_mode == "self-wise" else condition_z
            h = _APGLinear(h.shape[-1], units, cond.shape[-1],
                           rank_k=self.rank_k, overparam_p=self.overparam_p,
                           generate_bias=self.generate_bias,
                           hypernet_config=self.hypernet_config,
                           name=f"apg_linear_{i}")(h, cond)
            if self.batch_norm:
                h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"bn_{i}")(h)
            h = Activation(acts[i], hidden_dim=units)(h, train=train)
            if self.dropout_rates > 0:
                h = nn.Dropout(self.dropout_rates,
                               deterministic=not train)(h)
        if self.output_dim is None:
            # ref APG_MLP(output_dim=None) has no out_proj (APG.py:177-178)
            return h
        return _dense(self.output_dim, "fc")(h)


class _APGDeepFMNet(nn.Module):
    """(ref: model_zoo/APG/src/APG_DeepFM.py:22-150)"""

    feature_map: Any
    embedding_dim: int = 10
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False
    hypernet_config: Dict = None
    condition_features: Sequence[str] = ()
    condition_mode: str = "self-wise"
    new_condition_emb: bool = False
    rank_k: int = 8
    overparam_p: int = None
    generate_bias: bool = True

    def _condition_z(self, batch, emb_layer, emb_dict, train):
        if self.condition_mode == "self-wise":
            return None
        if self.new_condition_emb:
            return FeatureEmbedding(
                self.feature_map, self.embedding_dim,
                required_feature_columns=tuple(self.condition_features),
                name="condition_embedding")(batch, flatten_emb=True)
        return emb_layer.dict2tensor(emb_dict,
                                     feature_list=tuple(self.condition_features),
                                     flatten_emb=True)

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        emb = emb_layer.dict2tensor(emb_dict)
        cond = self._condition_z(batch, emb_layer, emb_dict, train)
        y = FactorizationMachine(self.feature_map, name="fm")(batch, emb)
        y = y + _APGMLP(tuple(self.hidden_units), self.hidden_activations,
                        1, self.net_dropout, self.batch_norm,
                        self.condition_mode, None, self.rank_k,
                        self.overparam_p, self.generate_bias,
                        self.hypernet_config, name="mlp")(
            _flat(emb), cond, train=train)
        return {"y_pred": y}


@register_model
class APG_DeepFM(RankModel):
    """APG_DeepFM (ref: model_zoo/APG/src/APG_DeepFM.py:22-150)."""

    def __init__(self, feature_map, model_id="APG_DeepFM", learning_rate=1e-3,
                 embedding_dim=10, hidden_units=(64, 64, 64),
                 hidden_activations="relu", net_dropout=0.0, batch_norm=False,
                 hypernet_config=None, condition_features=(),
                 condition_mode="self-wise", new_condition_emb=False,
                 rank_k=8, overparam_p=None, generate_bias=True, **kwargs):
        net = _APGDeepFMNet(feature_map, embedding_dim, tuple(hidden_units),
                            hidden_activations, net_dropout, batch_norm,
                            hypernet_config, tuple(condition_features),
                            condition_mode, new_condition_emb, rank_k,
                            overparam_p, generate_bias)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


class _APGDCNv2Net(nn.Module):
    """(ref: model_zoo/APG/src/APG_DCNv2.py:24-160): DCNv2-parallel with an
    APG-generated parallel DNN."""

    feature_map: Any
    embedding_dim: int = 10
    num_cross_layers: int = 3
    parallel_dnn_hidden_units: Sequence[int] = (64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False
    hypernet_config: Dict = None
    condition_features: Sequence[str] = ()
    condition_mode: str = "self-wise"
    new_condition_emb: bool = False
    rank_k: int = 8
    overparam_p: int = None
    generate_bias: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        emb = _flat(emb_layer.dict2tensor(emb_dict))
        if self.condition_mode == "self-wise":
            cond = None
        elif self.new_condition_emb:
            cond = FeatureEmbedding(
                self.feature_map, self.embedding_dim,
                required_feature_columns=tuple(self.condition_features),
                name="condition_embedding")(batch, flatten_emb=True)
        else:
            cond = emb_layer.dict2tensor(
                emb_dict, feature_list=tuple(self.condition_features),
                flatten_emb=True)
        cross = CrossNetV2(emb.shape[-1], self.num_cross_layers,
                           name="crossnet")(emb)
        deep = _APGMLP(tuple(self.parallel_dnn_hidden_units),
                       self.hidden_activations,
                       None,      # ref parallel APG_MLP has no out_proj
                       self.net_dropout, self.batch_norm,
                       self.condition_mode, None, self.rank_k,
                       self.overparam_p, self.generate_bias,
                       self.hypernet_config, name="parallel_dnn")(
            emb, cond, train=train)
        y = _dense(1, "fc")(jnp.concatenate([cross, deep], axis=-1))
        return {"y_pred": y}


@register_model
class APG_DCNv2(RankModel):
    """APG_DCNv2 (ref: model_zoo/APG/src/APG_DCNv2.py:24-160)."""

    def __init__(self, feature_map, model_id="APG_DCNv2", learning_rate=1e-3,
                 embedding_dim=10, num_cross_layers=3,
                 parallel_dnn_hidden_units=(64, 64), hidden_activations="relu",
                 net_dropout=0.0, batch_norm=False, hypernet_config=None,
                 condition_features=(), condition_mode="self-wise",
                 new_condition_emb=False, rank_k=8, overparam_p=None,
                 generate_bias=True, **kwargs):
        net = _APGDCNv2Net(feature_map, embedding_dim, num_cross_layers,
                           tuple(parallel_dnn_hidden_units),
                           hidden_activations, net_dropout, batch_norm,
                           hypernet_config, tuple(condition_features),
                           condition_mode, new_condition_emb, rank_k,
                           overparam_p, generate_bias)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
