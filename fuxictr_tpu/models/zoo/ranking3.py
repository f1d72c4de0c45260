"""Feature-interaction ranking models, tranche 3.

DeepCrossing, DeepIM, FiBiNET, AFN(+), CCPM, FLEN, MaskNet, SAM, AOANet,
DLRM, DSSM. Each class cites its reference parity target.
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.blocks import LogisticRegression
from fuxictr_tpu.ops.common import Activation, xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.interactions import (BilinearInteraction,
                                          InnerProductInteraction,
                                          InteractionMachine,
                                          SqueezeExcitation)
from fuxictr_tpu.ops.mlp import MLP_Block
from fuxictr_tpu.ops.pooling import KMaxPooling


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _dense(units, name, use_bias=True):
    return nn.Dense(units, use_bias=use_bias, kernel_init=xavier_normal(),
                    bias_init=zeros_init, name=name)


# ----------------------------------------------------------- DeepCrossing
class _ResidualBlock(nn.Module):
    """(ref: model_zoo/DeepCrossing/src/DeepCrossing.py:98-140)"""

    hidden_dim: int
    hidden_activation: str = "relu"
    dropout_rate: float = 0.0
    use_residual: bool = True
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        input_dim = x.shape[-1]
        h = _dense(self.hidden_dim, "fc1")(x)
        h = Activation(self.hidden_activation,
                       hidden_dim=self.hidden_dim)(h, train=train)
        h = _dense(input_dim, "fc2")(h)
        if self.use_residual:
            h = h + x
        if self.batch_norm:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = jax.nn.relu(h)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return h


class _DeepCrossingNet(nn.Module):
    """(ref: model_zoo/DeepCrossing/src/DeepCrossing.py:25-95)"""

    feature_map: Any
    embedding_dim: int = 10
    residual_blocks: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False
    use_residual: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        x = FeatureEmbedding(self.feature_map, self.embedding_dim,
                             name="embedding")(batch, flatten_emb=True)
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * len(self.residual_blocks)
        for i, (dim, act) in enumerate(zip(self.residual_blocks, acts)):
            x = _ResidualBlock(dim, act, self.net_dropout, self.use_residual,
                               self.batch_norm, name=f"res_{i}")(x, train=train)
        return {"y_pred": _dense(1, "fc")(x)}


@register_model
class DeepCrossing(RankModel):
    """DeepCrossing (ref: model_zoo/DeepCrossing/src/DeepCrossing.py:25-140)."""

    def __init__(self, feature_map, model_id="DeepCrossing",
                 learning_rate=1e-3, embedding_dim=10,
                 residual_blocks=(64, 64, 64), hidden_activations="relu",
                 net_dropout=0.0, batch_norm=False, use_residual=True,
                 **kwargs):
        net = _DeepCrossingNet(feature_map, embedding_dim,
                               tuple(residual_blocks), hidden_activations,
                               net_dropout, batch_norm, use_residual)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ----------------------------------------------------------------- DeepIM
class _DeepIMNet(nn.Module):
    """(ref: model_zoo/DeepIM/src/DeepIM.py:25-100)"""

    feature_map: Any
    embedding_dim: int = 10
    im_order: int = 2
    im_batch_norm: bool = False
    hidden_units: Sequence[int] = (64, 64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    net_batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        y = InteractionMachine(self.embedding_dim, self.im_order,
                               self.im_batch_norm, name="im")(emb, train=train)
        if self.hidden_units:
            y = y + MLP_Block(hidden_units=tuple(self.hidden_units),
                              hidden_activations=self.hidden_activations,
                              output_dim=1, dropout_rates=self.net_dropout,
                              batch_norm=self.net_batch_norm,
                              name="dnn")(_flat(emb), train=train)
        return {"y_pred": y}


@register_model
class DeepIM(RankModel):
    """DeepIM (ref: model_zoo/DeepIM/src/DeepIM.py:25-100)."""

    def __init__(self, feature_map, model_id="DeepIM", learning_rate=1e-3,
                 embedding_dim=10, im_order=2, im_batch_norm=False,
                 hidden_units=(64, 64, 64), hidden_activations="relu",
                 net_dropout=0.0, net_batch_norm=False, **kwargs):
        net = _DeepIMNet(feature_map, embedding_dim, im_order, im_batch_norm,
                         tuple(hidden_units) if hidden_units else (),
                         hidden_activations, net_dropout, net_batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- FiBiNET
class _FiBiNETNet(nn.Module):
    """(ref: model_zoo/FiBiNET/src/FiBiNET.py:26-120): SENET-reweighted and
    raw embeddings through two bilinear interactions → DNN; plus LR."""

    feature_map: Any
    embedding_dim: int = 10
    hidden_units: Sequence[int] = (64,)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    excitation_activation: str = "relu"
    reduction_ratio: int = 3
    bilinear_type: str = "field_interaction"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        senet_emb = SqueezeExcitation(F, self.reduction_ratio,
                                      self.excitation_activation,
                                      name="senet")(emb, train=train)
        p = BilinearInteraction(F, self.embedding_dim, self.bilinear_type,
                                name="bilinear1")(emb)
        q = BilinearInteraction(F, self.embedding_dim, self.bilinear_type,
                                name="bilinear2")(senet_emb)
        comb = jnp.concatenate([_flat(p), _flat(q)], axis=1)
        y = MLP_Block(hidden_units=tuple(self.hidden_units),
                      hidden_activations=self.hidden_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm, name="dnn")(comb, train=train)
        y = y + LogisticRegression(self.feature_map, use_bias=False,
                                   name="embedding_lr")(batch)
        return {"y_pred": y}


@register_model
class FiBiNET(RankModel):
    """FiBiNET (ref: model_zoo/FiBiNET/src/FiBiNET.py:26-120)."""

    def __init__(self, feature_map, model_id="FiBiNET", learning_rate=1e-3,
                 embedding_dim=10, hidden_units=(64,),
                 hidden_activations="relu", excitation_activation="relu",
                 reduction_ratio=3, bilinear_type="field_interaction",
                 net_dropout=0.0, batch_norm=False, **kwargs):
        net = _FiBiNETNet(feature_map, embedding_dim, tuple(hidden_units),
                          hidden_activations, excitation_activation,
                          reduction_ratio, bilinear_type, net_dropout,
                          batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- AFN
class _AFNNet(nn.Module):
    """Adaptive factorization network (ref: model_zoo/AFN/src/AFN.py:27-140):
    log-transformed embeddings → learned-order cross terms via exp(W log) →
    DNN; optional ensembled plain DNN (AFN+)."""

    feature_map: Any
    embedding_dim: int = 10
    ensemble_dnn: bool = True
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    dnn_dropout: float = 0.0
    afn_hidden_units: Sequence[int] = (64, 64, 64)
    afn_activations: Union[str, Sequence[str]] = "relu"
    afn_dropout: float = 0.0
    logarithmic_neurons: int = 5
    batch_norm: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)      # [B, F, D]
        x = jnp.clip(jnp.abs(emb), 1e-5, None)
        log_emb = jnp.log(x)
        log_emb = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                               axis=-1, name="log_bn")(
            log_emb.transpose(0, 2, 1)).transpose(0, 2, 1)
        log_out = jnp.einsum("bfd,fl->bld", log_emb,
                             self.param("coefficient_W", xavier_normal(),
                                        (self.feature_map.num_fields,
                                         self.logarithmic_neurons)))
        cross = jnp.exp(log_out)
        cross = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             axis=-1, name="exp_bn")(
            cross.transpose(0, 2, 1)).transpose(0, 2, 1)
        afn_out = MLP_Block(hidden_units=tuple(self.afn_hidden_units),
                            hidden_activations=self.afn_activations,
                            output_dim=1, dropout_rates=self.afn_dropout,
                            batch_norm=self.batch_norm,
                            name="afn_dnn")(_flat(cross), train=train)
        if self.ensemble_dnn:
            emb2 = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                    name="embedding2")(batch)
            dnn_out = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                                hidden_activations=self.dnn_activations,
                                output_dim=1, dropout_rates=self.dnn_dropout,
                                batch_norm=self.batch_norm,
                                name="dnn")(_flat(emb2), train=train)
            y = _dense(1, "fc")(jnp.concatenate([afn_out, dnn_out], axis=-1))
        else:
            y = afn_out
        return {"y_pred": y}


@register_model
class AFN(RankModel):
    """AFN/AFN+ (ref: model_zoo/AFN/src/AFN.py:27-140)."""

    def __init__(self, feature_map, model_id="AFN", learning_rate=1e-3,
                 embedding_dim=10, ensemble_dnn=True,
                 dnn_hidden_units=(64, 64, 64), dnn_activations="relu",
                 dnn_dropout=0.0, afn_hidden_units=(64, 64, 64),
                 afn_activations="relu", afn_dropout=0.0,
                 logarithmic_neurons=5, batch_norm=True, **kwargs):
        net = _AFNNet(feature_map, embedding_dim, ensemble_dnn,
                      tuple(dnn_hidden_units), dnn_activations, dnn_dropout,
                      tuple(afn_hidden_units), afn_activations, afn_dropout,
                      logarithmic_neurons, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- CCPM
class _CCPMNet(nn.Module):
    """CCPM (ref: model_zoo/CCPM/src/CCPM.py:26-120): stacked 1D convs over
    the field axis with k-max pooling schedule, fc head."""

    feature_map: Any
    embedding_dim: int = 10
    channels: Sequence[int] = (4, 4, 2)
    kernel_heights: Sequence[int] = (6, 5, 3)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)      # [B, F, D]
        x = emb[..., None]                                   # [B, F, D, 1] NHWC
        layers = len(self.kernel_heights)
        F = self.feature_map.num_fields
        for i, (ch, kh) in enumerate(zip(self.channels, self.kernel_heights)):
            x = jnp.pad(x, ((0, 0), (kh - 1, kh - 1), (0, 0), (0, 0)))
            x = nn.Conv(ch, kernel_size=(kh, 1), padding="VALID",
                        kernel_init=xavier_normal(), name=f"conv_{i}")(x)
            if i + 1 < layers:
                k = max(3, int((1 - ((i + 1.0) / layers)
                                ** (layers - i - 1)) * F))
            else:
                k = 3
            x = KMaxPooling(k=min(k, x.shape[1]), axis=1)(x)
            x = Activation(self.activation)(x, train=train)
        return {"y_pred": _dense(1, "fc")(_flat(x))}


@register_model
class CCPM(RankModel):
    """CCPM (ref: model_zoo/CCPM/src/CCPM.py:26-140)."""

    def __init__(self, feature_map, model_id="CCPM", learning_rate=1e-3,
                 embedding_dim=10, channels=(4, 4, 2),
                 kernel_heights=(6, 5, 3), activation="tanh", **kwargs):
        if not isinstance(kernel_heights, (list, tuple)):
            kernel_heights = [kernel_heights] * len(channels)
        net = _CCPMNet(feature_map, embedding_dim, tuple(channels),
                       tuple(kernel_heights), activation)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- FLEN
class _FLENNet(nn.Module):
    """FLEN (ref: model_zoo/FLEN/src/FLEN.py:25-120): field-leveraged
    embeddings — MF over per-source field sums + FM within sources + DNN."""

    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        emb_user = emb_layer.dict2tensor(emb_dict, feature_source="user")
        emb_item = emb_layer.dict2tensor(emb_dict, feature_source="item")
        emb_ctx = emb_layer.dict2tensor(emb_dict, feature_source="context")
        emb_all = emb_layer.dict2tensor(emb_dict)
        lr_out = LogisticRegression(self.feature_map,
                                    name="embedding_lr")(batch)
        field_emb = jnp.stack([emb_user.sum(axis=1), emb_item.sum(axis=1),
                               emb_ctx.sum(axis=1)], axis=1)  # [B, 3, D]
        mf = InnerProductInteraction(3, output="elementwise_product")(
            field_emb)                                        # [B, 3, D]
        h_MF = _dense(1, "r_ij", use_bias=False)(
            mf.transpose(0, 2, 1))                            # [B, D, 1]
        fm_parts = jnp.stack(
            [InnerProductInteraction(e.shape[1], output="bi_interaction")(e)
             for e in (emb_user, emb_item, emb_ctx)], axis=1)  # [B, 3, D]
        h_FM = _dense(1, "r_mm", use_bias=False)(
            fm_parts.transpose(0, 2, 1))                      # [B, D, 1]
        fwbi = jnp.concatenate([lr_out, (h_MF + h_FM)[..., 0]], axis=-1)
        h_FwBI = jax.nn.relu(_dense(self.embedding_dim + 1, "w_FwBI",
                                    use_bias=False)(fwbi))
        h_L = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                        hidden_activations=self.dnn_activations,
                        dropout_rates=self.net_dropout,
                        batch_norm=self.batch_norm,
                        name="dnn")(_flat(emb_all), train=train)
        y = _dense(1, "w_F", use_bias=False)(
            jnp.concatenate([h_FwBI, h_L], axis=-1))
        return {"y_pred": y}


@register_model
class FLEN(RankModel):
    """FLEN (ref: model_zoo/FLEN/src/FLEN.py:25-120). Requires feature
    sources user/item/context in the schema."""

    def __init__(self, feature_map, model_id="FLEN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(64, 64, 64),
                 dnn_activations="relu", net_dropout=0.0, batch_norm=False,
                 **kwargs):
        net = _FLENNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                       dnn_activations, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)

    _requires_sources = True


# ---------------------------------------------------------------- MaskNet
class _MaskBlock(nn.Module):
    """(ref: model_zoo/MaskNet/src/MaskNet.py:236-270)"""

    hidden_dim: int
    output_dim: int
    hidden_activation: str = "relu"
    reduction_ratio: float = 1.0
    dropout_rate: float = 0.0
    layer_norm: bool = True

    @nn.compact
    def __call__(self, v_emb, v_hidden, train=False):
        mask = _dense(int(self.hidden_dim * self.reduction_ratio),
                      "mask_1")(v_emb)
        mask = jax.nn.relu(mask)
        mask = _dense(self.hidden_dim, "mask_2")(mask)
        h = _dense(self.output_dim, "hidden", use_bias=False)(v_hidden * mask)
        if self.layer_norm:
            h = nn.LayerNorm(epsilon=1e-5)(h)
        h = Activation(self.hidden_activation,
                       hidden_dim=self.output_dim)(h, train=train)
        if self.dropout_rate > 0:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return h


class _MaskNetNet(nn.Module):
    """(ref: model_zoo/MaskNet/src/MaskNet.py:27-235): per-field LayerNorm
    on embeddings, then serial or parallel mask blocks."""

    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_hidden_activations: Union[str, Sequence[str]] = "relu"
    model_type: str = "SerialMaskNet"
    parallel_num_blocks: int = 1
    parallel_block_dim: int = 64
    reduction_ratio: float = 1.0
    net_dropout: float = 0.0
    emb_layernorm: bool = True
    net_layernorm: bool = True

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)      # [B, F, D]
        if self.emb_layernorm:
            # per-field LayerNorm (the reference keeps one nn.LayerNorm per
            # field, MaskNet.py:98 — separate scale/bias per field, stats
            # over D): one vectorized norm with [F, D] affine params
            F_, D_ = emb.shape[1], emb.shape[2]
            mean = jnp.mean(emb, axis=-1, keepdims=True)
            var = jnp.var(emb, axis=-1, keepdims=True)
            g = self.param("emb_ln_scale", nn.initializers.ones, (F_, D_))
            b = self.param("emb_ln_bias", zeros_init, (F_, D_))
            hidden = (emb - mean) * jax.lax.rsqrt(var + 1e-5) * g + b
        else:
            hidden = emb
        # mask inputs use the RAW embedding; the normed one seeds the
        # hidden stream (MaskNet.py:121: mask_net(feature_emb, V_hidden))
        v_emb = _flat(emb)
        v_hidden = _flat(hidden)
        acts = self.dnn_hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * max(len(self.dnn_hidden_units),
                                self.parallel_num_blocks)
        if self.model_type == "SerialMaskNet":
            units = [v_hidden.shape[-1]] + list(self.dnn_hidden_units)
            h = v_hidden
            for i in range(len(units) - 1):
                h = _MaskBlock(units[i], units[i + 1], acts[i],
                               self.reduction_ratio, self.net_dropout,
                               self.net_layernorm,
                               name=f"block_{i}")(v_emb, h, train=train)
            y = _dense(1, "fc")(h)
        elif self.model_type == "ParallelMaskNet":
            blocks = [
                _MaskBlock(v_emb.shape[-1], self.parallel_block_dim, acts[0],
                           self.reduction_ratio, self.net_dropout,
                           self.net_layernorm,
                           name=f"block_{i}")(v_emb, v_hidden, train=train)
                for i in range(self.parallel_num_blocks)]
            y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                          hidden_activations=self.dnn_hidden_activations,
                          output_dim=1, dropout_rates=self.net_dropout,
                          name="dnn")(jnp.concatenate(blocks, axis=-1),
                                      train=train)
        else:
            raise ValueError(f"model_type={self.model_type} not supported.")
        return {"y_pred": y}


@register_model
class MaskNet(RankModel):
    """MaskNet (ref: model_zoo/MaskNet/src/MaskNet.py:27-270)."""

    def __init__(self, feature_map, model_id="MaskNet", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(64, 64, 64),
                 dnn_hidden_activations="relu", model_type="SerialMaskNet",
                 parallel_num_blocks=1, parallel_block_dim=64,
                 reduction_ratio=1, net_dropout=0.0, emb_layernorm=True,
                 net_layernorm=True, **kwargs):
        net = _MaskNetNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                          dnn_hidden_activations, model_type,
                          parallel_num_blocks, parallel_block_dim,
                          reduction_ratio, net_dropout, emb_layernorm,
                          net_layernorm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- SAM
class _SAMNet(nn.Module):
    """SAM (ref: model_zoo/SAM/src/SAM.py:30-260): self-attentive pairwise
    interactions SAM2A/2E (single layer, [B,F,F,D]) or SAM3A/3E (stacked,
    [B,F,D]) with concat/pooling aggregation."""

    feature_map: Any
    embedding_dim: int = 10
    interaction_type: str = "SAM2E"
    aggregation: str = "concat"
    num_interaction_layers: int = 3
    use_residual: bool = False
    net_dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train=False):
        F_n = self.feature_map.num_fields
        D = self.embedding_dim
        F = FeatureEmbedding(self.feature_map, D, name="embedding")(batch)
        t = self.interaction_type
        if t in ("SAM2A", "SAM2E"):
            assert self.aggregation == "concat", \
                "Only aggregation=concat is supported for SAM2A/SAM2E."
            S = jnp.einsum("bnd,bmd->bnm", F, F)
            if t == "SAM2A":
                W = self.param("W", nn.initializers.ones, (F_n, F_n, D))
                out = S[..., None] * W[None]
            else:
                U = jnp.einsum("bnd,bmd->bnmd", F, F)
                out = S[..., None] * U
            if self.net_dropout > 0:
                out = nn.Dropout(self.net_dropout,
                                 deterministic=not train)(out)
        else:
            out = F
            for i in range(self.num_interaction_layers):
                K = _dense(D, f"K_{i}", use_bias=False)(out)
                S = jnp.einsum("bnd,bmd->bnm", out, K)
                if t == "SAM3A":
                    W = self.param(f"W_{i}", nn.initializers.ones,
                                   (F_n, F_n, D))
                    new = jnp.einsum("bnm,nmd->bnd", S, W)
                else:  # SAM3E
                    U = jnp.einsum("bnd,bmd->bnmd", out, out)
                    new = jnp.einsum("bnm,bnmd->bnd", S, U)
                if self.use_residual:
                    new = new + _dense(D, f"Q_{i}", use_bias=False)(out)
                if self.net_dropout > 0:
                    new = nn.Dropout(self.net_dropout,
                                     deterministic=not train)(new)
                out = new
        if self.aggregation == "concat":
            agg = _flat(out)
        elif self.aggregation == "weighted_pooling":
            w = self.param("agg_weight", nn.initializers.ones, (F_n, 1))
            agg = jnp.sum(out * w[None], axis=1)
        elif self.aggregation == "mean_pooling":
            agg = jnp.mean(out, axis=1)
        elif self.aggregation == "sum_pooling":
            agg = jnp.sum(out, axis=1)
        else:
            raise ValueError(f"aggregation={self.aggregation} not supported.")
        return {"y_pred": _dense(1, "fc")(agg)}


@register_model
class SAM(RankModel):
    """SAM (ref: model_zoo/SAM/src/SAM.py:30-260)."""

    def __init__(self, feature_map, model_id="SAM", learning_rate=1e-3,
                 embedding_dim=10, interaction_type="SAM2E",
                 aggregation="concat", num_interaction_layers=3,
                 use_residual=False, net_dropout=0.0, **kwargs):
        net = _SAMNet(feature_map, embedding_dim, interaction_type,
                      aggregation, num_interaction_layers, use_residual,
                      net_dropout)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ----------------------------------------------------------------- AOANet
class _GeneralizedInteraction(nn.Module):
    """(ref: model_zoo/AOANet/src/AOANet.py:137-171)"""

    input_subspaces: int
    output_subspaces: int
    num_fields: int
    embedding_dim: int

    @nn.compact
    def __call__(self, B0, Bi):
        D = self.embedding_dim
        # all (field, subspace) outer products
        left = jnp.repeat(B0, self.input_subspaces, axis=1)   # [B, F*S, D]
        right = jnp.tile(Bi, (1, 1, self.num_fields)).reshape(
            Bi.shape[0], -1, D)                               # [B, S*F, D]
        outer = jnp.einsum("bnh,bnd->bnhd", left, right)      # [B, F*S, D, D]
        alpha = self.param("alpha", nn.initializers.ones,
                           (self.input_subspaces * self.num_fields,
                            self.output_subspaces))
        fusion = jnp.einsum("bnhd,no->bohd", outer, alpha)    # [B, O, D, D]
        W = self.param("W", lambda k, s: jnp.tile(jnp.eye(D)[None],
                                                  (s[0], 1, 1)),
                       (self.output_subspaces, D, D))
        fusion = W[None] * fusion
        h = self.param("h", nn.initializers.ones,
                       (self.output_subspaces, D, 1))
        return jnp.einsum("bohd,odk->boh", fusion, h)         # [B, O, D]


class _AOANetNet(nn.Module):
    """(ref: model_zoo/AOANet/src/AOANet.py:30-171)"""

    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_hidden_activations: Union[str, Sequence[str]] = "relu"
    num_interaction_layers: int = 3
    num_subspaces: int = 4
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        dnn_out = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                            hidden_activations=self.dnn_hidden_activations,
                            dropout_rates=self.net_dropout,
                            batch_norm=self.batch_norm,
                            name="dnn")(_flat(emb), train=train)
        B = emb
        for i in range(self.num_interaction_layers):
            B = _GeneralizedInteraction(
                self.feature_map.num_fields if i == 0 else self.num_subspaces,
                self.num_subspaces, self.feature_map.num_fields,
                self.embedding_dim, name=f"gin_{i}")(emb, B)
        y = _dense(1, "fc")(jnp.concatenate([dnn_out, _flat(B)], axis=-1))
        return {"y_pred": y}


@register_model
class AOANet(RankModel):
    """AOANet (ref: model_zoo/AOANet/src/AOANet.py:30-171)."""

    def __init__(self, feature_map, model_id="AOANet", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(64, 64, 64),
                 dnn_hidden_activations="relu", num_interaction_layers=3,
                 num_subspaces=4, net_dropout=0.0, batch_norm=False, **kwargs):
        net = _AOANetNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                         dnn_hidden_activations, num_interaction_layers,
                         num_subspaces, net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- DLRM
class _DLRMNet(nn.Module):
    """DLRM (ref: model_zoo/DLRM/src/DLRM.py:25-123): bottom MLP condenses
    all dense features into one embedding row; dot or cat interaction;
    top MLP head."""

    feature_map: Any
    embedding_dim: int = 10
    top_mlp_units: Sequence[int] = (64, 64, 64)
    bottom_mlp_units: Sequence[int] = (64, 64, 64)
    top_mlp_activations: Union[str, Sequence[str]] = "relu"
    bottom_mlp_activations: Union[str, Sequence[str]] = "relu"
    top_mlp_dropout: float = 0.0
    bottom_mlp_dropout: float = 0.0
    interaction_op: str = "dot"
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        dense_feats = [name for name, spec in
                       self.feature_map.features.items()
                       if spec["type"] == "numeric"]
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               not_required_feature_columns=tuple(dense_feats),
                               name="embedding")(batch)
        dense_emb = None
        if dense_feats:
            dense_x = jnp.stack(
                [batch[k].astype(jnp.float32).reshape(-1) for k in
                 dense_feats], axis=-1)
            dense_emb = MLP_Block(
                hidden_units=tuple(self.bottom_mlp_units),
                hidden_activations=self.bottom_mlp_activations,
                output_dim=self.embedding_dim,
                output_activation=self.bottom_mlp_activations
                if isinstance(self.bottom_mlp_activations, str) else "relu",
                dropout_rates=self.bottom_mlp_dropout,
                batch_norm=self.batch_norm,
                name="bottom_mlp")(dense_x, train=train)
            emb = jnp.concatenate([emb, dense_emb[:, None, :]], axis=1)
        n_fields = emb.shape[1]
        if self.interaction_op == "dot":
            inter = InnerProductInteraction(n_fields,
                                            output="inner_product")(emb)
            if dense_emb is not None:
                inter = jnp.concatenate([inter, dense_emb], axis=-1)
        elif self.interaction_op == "cat":
            inter = _flat(emb)
        else:
            raise ValueError(
                f"interaction_op={self.interaction_op} not supported.")
        y = MLP_Block(hidden_units=tuple(self.top_mlp_units),
                      hidden_activations=self.top_mlp_activations,
                      output_dim=1, dropout_rates=self.top_mlp_dropout,
                      batch_norm=self.batch_norm,
                      name="top_mlp")(inter, train=train)
        return {"y_pred": y}


@register_model
class DLRM(RankModel):
    """DLRM (ref: model_zoo/DLRM/src/DLRM.py:25-123)."""

    def __init__(self, feature_map, model_id="DLRM", learning_rate=1e-3,
                 embedding_dim=10, top_mlp_units=(64, 64, 64),
                 bottom_mlp_units=(64, 64, 64), top_mlp_activations="relu",
                 bottom_mlp_activations="relu", top_mlp_dropout=0.0,
                 bottom_mlp_dropout=0.0, interaction_op="dot",
                 batch_norm=False, **kwargs):
        net = _DLRMNet(feature_map, embedding_dim, tuple(top_mlp_units),
                       tuple(bottom_mlp_units), top_mlp_activations,
                       bottom_mlp_activations, top_mlp_dropout,
                       bottom_mlp_dropout, interaction_op, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- DSSM
class _DSSMNet(nn.Module):
    """DSSM (ref: model_zoo/DSSM/src/DSSM.py:24-110): user/item towers over
    source-filtered embeddings; dot-product score."""

    feature_map: Any
    embedding_dim: int = 10
    user_tower_units: Sequence[int] = (64, 64, 64)
    item_tower_units: Sequence[int] = (64, 64, 64)
    user_tower_activations: Union[str, Sequence[str]] = "relu"
    item_tower_activations: Union[str, Sequence[str]] = "relu"
    user_tower_dropout: float = 0.0
    item_tower_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        user_emb = emb_layer.dict2tensor(emb_dict, feature_source="user")
        item_emb = emb_layer.dict2tensor(emb_dict, feature_source="item")
        user_out = MLP_Block(
            hidden_units=tuple(self.user_tower_units[:-1]),
            hidden_activations=self.user_tower_activations,
            output_dim=self.user_tower_units[-1],
            dropout_rates=self.user_tower_dropout,
            batch_norm=self.batch_norm,
            name="user_tower")(_flat(user_emb), train=train)
        item_out = MLP_Block(
            hidden_units=tuple(self.item_tower_units[:-1]),
            hidden_activations=self.item_tower_activations,
            output_dim=self.item_tower_units[-1],
            dropout_rates=self.item_tower_dropout,
            batch_norm=self.batch_norm,
            name="item_tower")(_flat(item_emb), train=train)
        y = jnp.sum(user_out * item_out, axis=-1, keepdims=True)
        return {"y_pred": y}


@register_model
class DSSM(RankModel):
    """DSSM (ref: model_zoo/DSSM/src/DSSM.py:24-110). Requires feature
    sources user/item in the schema."""

    def __init__(self, feature_map, model_id="DSSM", learning_rate=1e-3,
                 embedding_dim=10, user_tower_units=(64, 64, 64),
                 item_tower_units=(64, 64, 64), user_tower_activations="relu",
                 item_tower_activations="relu", user_tower_dropout=0.0,
                 item_tower_dropout=0.0, batch_norm=False, **kwargs):
        net = _DSSMNet(feature_map, embedding_dim, tuple(user_tower_units),
                       tuple(item_tower_units), user_tower_activations,
                       item_tower_activations, user_tower_dropout,
                       item_tower_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)

    _requires_sources = True
