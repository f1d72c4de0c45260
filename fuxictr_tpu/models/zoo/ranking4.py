"""Feature-interaction ranking models, tranche 4.

GDCN/GDCNP, EDCN, FiGNN, FGCNN, InterHAt, DESTINE, FinalMLP, FinalNet,
EulerNet, WuKong, QNN. Each class cites its reference parity target.
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.blocks import LogisticRegression
from fuxictr_tpu.ops.common import Activation, xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.interactions import InnerProductInteraction
from fuxictr_tpu.ops.mlp import MLP_Block


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _dense(units, name, use_bias=True):
    return nn.Dense(units, use_bias=use_bias, kernel_init=xavier_normal(),
                    bias_init=zeros_init, name=name)


# ------------------------------------------------------------------- GDCN
class _GateCrossLayer(nn.Module):
    """Gated cross: x ← x0 ∘ (Wx + b) ∘ σ(Wg x) + x
    (ref: model_zoo/GDCN/src/GDCN.py:170-205)."""

    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        x0 = x
        dim = x.shape[-1]
        for i in range(self.num_layers):
            xw = _dense(dim, f"w_{i}", use_bias=False)(x)
            b = self.param(f"b_{i}", jax.nn.initializers.uniform(1.0), (dim,))
            xg = jax.nn.sigmoid(_dense(dim, f"wg_{i}", use_bias=False)(x))
            x = x0 * (xw + b) * xg + x
        return x


class _GDCNNet(nn.Module):
    """(ref: model_zoo/GDCN/src/GDCN.py — GDCN stacked / GDCNP parallel)."""

    feature_map: Any
    embedding_dim: int = 10
    structure: str = "parallel"      # GDCNP=parallel, GDCN=stacked
    dnn_hidden_units: Sequence[int] = (64, 64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    num_cross_layers: int = 3
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        cross = _GateCrossLayer(self.num_cross_layers, name="cross_net")(emb)
        if self.structure == "parallel":
            deep = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                             hidden_activations=self.dnn_activations,
                             dropout_rates=self.net_dropout,
                             batch_norm=self.batch_norm,
                             name="dnn")(emb, train=train)
            y = _dense(1, "fc")(jnp.concatenate([cross, deep], axis=1))
        else:
            deep = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                             hidden_activations=self.dnn_activations,
                             dropout_rates=self.net_dropout,
                             batch_norm=self.batch_norm,
                             name="dnn")(cross, train=train)
            y = _dense(1, "fc")(deep)
        return {"y_pred": y}


@register_model
class GDCN(RankModel):
    """GDCN stacked (ref: model_zoo/GDCN/src/GDCN.py)."""

    _structure = "stacked"

    def __init__(self, feature_map, model_id=None, learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(64, 64, 64),
                 dnn_activations="relu", num_cross_layers=3, net_dropout=0.0,
                 batch_norm=False, **kwargs):
        net = _GDCNNet(feature_map, embedding_dim, self._structure,
                       tuple(dnn_hidden_units), dnn_activations,
                       num_cross_layers, net_dropout, batch_norm)
        super().__init__(feature_map, net=net,
                         model_id=model_id or type(self).__name__, **kwargs)
        self.compile(lr=learning_rate)


@register_model
class GDCNP(GDCN):
    """GDCN parallel (ref: model_zoo/GDCN/src/GDCN.py:20-95)."""

    _structure = "parallel"


# ------------------------------------------------------------------- EDCN
class _EDCNNet(nn.Module):
    """EDCN (ref: model_zoo/EDCN/src/EDCN.py:27-196): parallel cross/deep
    towers exchanging information through bridge + regulation modules."""

    feature_map: Any
    embedding_dim: int = 10
    num_cross_layers: int = 3
    hidden_activations: str = "relu"
    bridge_type: str = "hadamard_product"
    temperature: float = 1.0
    net_dropout: float = 0.0
    batch_norm: bool = False

    def _regulate(self, x, i, train):
        F = self.feature_map.num_fields
        D = self.embedding_dim
        g1 = self.param(f"g1_{i}", nn.initializers.ones, (F,))
        g2 = self.param(f"g2_{i}", nn.initializers.ones, (F,))
        w1 = jnp.repeat(jax.nn.softmax(g1 / self.temperature), D)
        w2 = jnp.repeat(jax.nn.softmax(g2 / self.temperature), D)
        o1, o2 = w1[None] * x, w2[None] * x
        if self.batch_norm:
            o1 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              name=f"bn1_{i}")(o1)
            o2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                              name=f"bn2_{i}")(o2)
        return o1, o2

    def _bridge(self, x1, x2, i):
        t = self.bridge_type
        if t == "hadamard_product":
            return x1 * x2
        if t == "pointwise_addition":
            return x1 + x2
        dim = x1.shape[-1]
        if t == "concatenation":
            return jax.nn.relu(_dense(dim, f"concat_pool_{i}")(
                jnp.concatenate([x1, x2], axis=-1)))
        if t == "attention_pooling":
            def att(x, name):
                h = jax.nn.relu(_dense(dim, f"{name}_1")(x))
                return jax.nn.softmax(
                    _dense(dim, f"{name}_2", use_bias=False)(h), axis=-1)
            return att(x1, f"att1_{i}") * x1 + att(x2, f"att2_{i}") * x2
        raise ValueError(f"bridge_type={t} is not supported.")

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        dim = emb.shape[-1]
        cross_i, deep_i = self._regulate(emb, 0, train)
        cross_0 = cross_i
        bridge_i = None
        for i in range(self.num_cross_layers):
            # CrossInteraction: x0 * (w^T x_i) + b + x_i (rank-1 DCN cross)
            w = self.param(f"cross_w_{i}", xavier_normal(), (dim, 1))
            b = self.param(f"cross_b_{i}", zeros_init, (dim,))
            cross_i = cross_0 * (cross_i @ w) + b + cross_i
            deep_i = MLP_Block(hidden_units=(dim,),
                               hidden_activations=self.hidden_activations,
                               dropout_rates=self.net_dropout,
                               name=f"dense_{i}")(deep_i, train=train)
            bridge_i = self._bridge(cross_i, deep_i, i)
            if i + 1 < self.num_cross_layers:
                cross_i, deep_i = self._regulate(bridge_i, i + 1, train)
        y = _dense(1, "fc")(jnp.concatenate([cross_i, deep_i, bridge_i],
                                            axis=-1))
        return {"y_pred": y}


@register_model
class EDCN(RankModel):
    """EDCN (ref: model_zoo/EDCN/src/EDCN.py:27-196)."""

    def __init__(self, feature_map, model_id="EDCN", learning_rate=1e-3,
                 embedding_dim=10, num_cross_layers=3,
                 hidden_activations="relu", bridge_type="hadamard_product",
                 temperature=1, net_dropout=0.0, batch_norm=False, **kwargs):
        net = _EDCNNet(feature_map, embedding_dim, num_cross_layers,
                       hidden_activations, bridge_type, float(temperature),
                       net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------ FiGNN
class _FiGNNNet(nn.Module):
    """FiGNN (ref: model_zoo/FiGNN/src/FiGNN.py:25-210): attentional field
    graph, per-field in/out transforms, GRU state updates, attentional
    prediction head."""

    feature_map: Any
    embedding_dim: int = 10
    gnn_layers: int = 3
    use_residual: bool = True
    use_gru: bool = True
    reuse_graph_layer: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        D = self.embedding_dim
        emb = FeatureEmbedding(self.feature_map, D, name="embedding")(batch)
        # attentional adjacency (no self loops)
        src = jnp.repeat(emb, F, axis=1)                     # [B, F*F, D]
        dst = jnp.tile(emb, (1, F, 1))
        alpha = _dense(1, "W_attn", use_bias=False)(
            jnp.concatenate([src, dst], axis=-1))
        alpha = jax.nn.leaky_relu(alpha[..., 0], 0.01).reshape(-1, F, F)
        eye = jnp.eye(F, dtype=bool)
        alpha = jnp.where(eye[None], -jnp.inf, alpha)
        g = jax.nn.softmax(alpha, axis=-1)

        def graph_layer(i_or_none, g, h):
            sfx = "" if i_or_none is None else f"_{i_or_none}"
            W_out = self.param(f"W_out{sfx}", xavier_normal(), (F, D, D))
            W_in = self.param(f"W_in{sfx}", xavier_normal(), (F, D, D))
            b = self.param(f"bias_p{sfx}", zeros_init, (D,))
            h_out = jnp.einsum("fde,bfe->bfd", W_out, h)
            aggr = jnp.einsum("bfg,bgd->bfd", g, h_out)
            return jnp.einsum("fde,bfe->bfd", W_in, aggr) + b

        gru = nn.GRUCell(features=D, name="gru") if self.use_gru else None
        h = emb
        for i in range(self.gnn_layers):
            a = graph_layer(None if self.reuse_graph_layer else i, g, h)
            if gru is not None:
                carry, _ = gru(h.reshape(-1, D), a.reshape(-1, D))
                h = carry.reshape(-1, F, D)
            else:
                h = a + h
            if self.use_residual:
                h = h + emb
        score = _dense(1, "mlp1", use_bias=False)(h)[..., 0]     # [B, F]
        weight = jax.nn.sigmoid(
            _dense(F, "mlp2", use_bias=False)(_flat(h)))         # [B, F]
        y = jnp.sum(weight * score, axis=1, keepdims=True)
        return {"y_pred": y}


@register_model
class FiGNN(RankModel):
    """FiGNN (ref: model_zoo/FiGNN/src/FiGNN.py:25-210)."""

    def __init__(self, feature_map, model_id="FiGNN", learning_rate=1e-3,
                 embedding_dim=10, gnn_layers=3, use_residual=True,
                 use_gru=True, reuse_graph_layer=False, **kwargs):
        net = _FiGNNNet(feature_map, embedding_dim, gnn_layers, use_residual,
                        use_gru, reuse_graph_layer)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------ FGCNN
class _FGCNNNet(nn.Module):
    """FGCNN (ref: model_zoo/FGCNN/src/FGCNN.py:28-230): conv feature
    generation over the field axis, recombination, then IPNN head over
    raw+generated fields."""

    feature_map: Any
    embedding_dim: int = 10
    share_embedding: bool = False
    channels: Sequence[int] = (14, 16, 18, 20)
    kernel_heights: Sequence[int] = (7, 7, 7, 7)
    pooling_sizes: Sequence[int] = (2, 2, 2, 2)
    recombined_channels: Sequence[int] = (2, 2, 2, 2)
    conv_activation: str = "tanh"
    conv_batch_norm: bool = True
    dnn_hidden_units: Sequence[int] = (64, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    dnn_batch_norm: bool = False
    net_dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train=False):
        D = self.embedding_dim
        emb = FeatureEmbedding(self.feature_map, D, name="embedding")(batch)
        emb2 = emb if self.share_embedding else FeatureEmbedding(
            self.feature_map, D, name="fg_embedding")(batch)
        x = emb2[..., None]                                  # NHWC [B, F, D, 1]
        new_fields = []
        height = self.feature_map.num_fields
        for i, (ch, kh, ps, rc) in enumerate(zip(
                self.channels, self.kernel_heights, self.pooling_sizes,
                self.recombined_channels)):
            x = nn.Conv(ch, kernel_size=(kh, 1),
                        padding=((int((kh - 1) / 2),) * 2, (0, 0)),
                        kernel_init=xavier_normal(), name=f"conv_{i}")(x)
            if self.conv_batch_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"conv_bn_{i}")(x)
            x = Activation(self.conv_activation)(x, train=train)
            pad = height % ps
            if pad:
                x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)),
                            constant_values=-jnp.inf)
            x = nn.max_pool(x, window_shape=(ps, 1), strides=(ps, 1))
            height = int(np.ceil(height / ps))
            recomb = _dense(height * D * rc, f"recombine_{i}")(_flat(x))
            recomb = Activation(self.conv_activation)(recomb, train=train)
            new_fields.append(recomb.reshape(-1, height * rc, D))
        combined = jnp.concatenate([emb] + new_fields, axis=1)
        inner = InnerProductInteraction(combined.shape[1],
                                        output="inner_product")(combined)
        dense_in = jnp.concatenate([_flat(combined), inner], axis=1)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.dnn_batch_norm,
                      name="dnn")(dense_in, train=train)
        return {"y_pred": y}


@register_model
class FGCNN(RankModel):
    """FGCNN (ref: model_zoo/FGCNN/src/FGCNN.py:28-230)."""

    def __init__(self, feature_map, model_id="FGCNN", learning_rate=1e-3,
                 embedding_dim=10, share_embedding=False,
                 channels=(14, 16, 18, 20), kernel_heights=(7, 7, 7, 7),
                 pooling_sizes=(2, 2, 2, 2), recombined_channels=(2, 2, 2, 2),
                 conv_activation="tanh", conv_batch_norm=True,
                 dnn_hidden_units=(64, 64), dnn_activations="relu",
                 dnn_batch_norm=False, net_dropout=0.0, **kwargs):
        if not isinstance(kernel_heights, (list, tuple)):
            kernel_heights = [kernel_heights] * len(channels)
        if not isinstance(pooling_sizes, (list, tuple)):
            pooling_sizes = [pooling_sizes] * len(channels)
        if not isinstance(recombined_channels, (list, tuple)):
            recombined_channels = [recombined_channels] * len(channels)
        net = _FGCNNNet(feature_map, embedding_dim, share_embedding,
                        tuple(channels), tuple(kernel_heights),
                        tuple(pooling_sizes), tuple(recombined_channels),
                        conv_activation, conv_batch_norm,
                        tuple(dnn_hidden_units), dnn_activations,
                        dnn_batch_norm, net_dropout)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- InterHAt
class _InterHAtNet(nn.Module):
    """InterHAt (ref: model_zoo/InterHAt/src/InterHAt.py:28-280):
    transformer layer + hierarchical attentional aggregation per order."""

    feature_map: Any
    embedding_dim: int = 10
    hidden_dim: int = None
    order: int = 2
    num_heads: int = 1
    attention_dim: int = 10
    hidden_units: Sequence[int] = (64, 64)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    batch_norm: bool = False
    layer_norm: bool = True
    use_residual: bool = True
    net_dropout: float = 0.0

    def _agg(self, x, name):
        hidden = self.hidden_dim or 4 * x.shape[-1]
        h = jax.nn.relu(_dense(hidden, f"{name}_1")(x))
        a = jax.nn.softmax(_dense(1, f"{name}_2", use_bias=False)(h), axis=1)
        return jnp.sum(a * x, axis=1)                        # [B, D]

    @nn.compact
    def __call__(self, batch, train=False):
        D = self.embedding_dim
        X0 = FeatureEmbedding(self.feature_map, D, name="embedding")(batch)
        # InterHAt's own MHA variant (InterHAt.py:127-213): out_dim =
        # heads*attention_dim, raw-view head split (interleaves heads with
        # fields, like DESTINE), W_res back-projection to input_dim, then
        # relu -> dropout -> +residual -> LN(input_dim)
        H, A = self.num_heads, self.attention_dim
        B, F = X0.shape[0], X0.shape[1]
        q = _dense(H * A, "W_q", use_bias=False)(X0)
        k = _dense(H * A, "W_k", use_bias=False)(X0)
        v = _dense(H * A, "W_v", use_bias=False)(X0)
        split = lambda t: t.reshape(B * H, -1, A)
        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("xqd,xkd->xqk", qh, kh) / (A ** 0.5)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("xqk,xkd->xqd", attn, vh).reshape(B, F, H * A)
        if self.use_residual:
            out = _dense(D, "W_res", use_bias=False)(out)
        out = jax.nn.relu(out)
        if self.net_dropout > 0:
            out = nn.Dropout(self.net_dropout,
                             deterministic=not train)(out)
        if self.use_residual:
            out = out + X0
        if self.layer_norm:
            out = nn.LayerNorm(epsilon=1e-5, name="mhsa_ln")(out)
        X1 = out
        # feed-forward keeps embedding_dim width (InterHAt.py:253-280)
        hidden = self.hidden_dim or 4 * D
        ffn = _dense(D, "ffn_2")(jax.nn.relu(_dense(hidden, "ffn_1")(X1)))
        if self.use_residual:
            ffn = ffn + X1
        if self.layer_norm:
            ffn = nn.LayerNorm(epsilon=1e-5, name="ffn_ln")(ffn)
        X1 = ffn
        X_p = X1
        agg_u = []
        for p in range(self.order):
            u_p = self._agg(X_p, f"agg_{p}")
            agg_u.append(u_p)
            if p != self.order - 1:
                X_p = u_p[:, None, :] * X1 + X_p
        U = jnp.stack(agg_u, axis=1)                         # [B, order, D]
        u_f = self._agg(U, "score")
        y = MLP_Block(hidden_units=tuple(self.hidden_units),
                      hidden_activations=self.hidden_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="mlp")(u_f, train=train)
        return {"y_pred": y}


@register_model
class InterHAt(RankModel):
    """InterHAt (ref: model_zoo/InterHAt/src/InterHAt.py:28-280)."""

    def __init__(self, feature_map, model_id="InterHAt", learning_rate=1e-3,
                 embedding_dim=10, hidden_dim=None, order=2, num_heads=1,
                 attention_dim=10, hidden_units=(64, 64),
                 hidden_activations="relu", batch_norm=False, layer_norm=True,
                 use_residual=True, net_dropout=0.0, **kwargs):
        net = _InterHAtNet(feature_map, embedding_dim, hidden_dim, order,
                           num_heads, attention_dim, tuple(hidden_units),
                           hidden_activations, batch_norm, layer_norm,
                           use_residual, net_dropout)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- DESTINE
class _DisentangledSelfAttention(nn.Module):
    """(ref: model_zoo/DESTINE/src/DESTINE.py:120-230): whitened pairwise
    attention + unary attention, summed."""

    attention_dim: int = 64
    num_heads: int = 1
    dropout_rate: float = 0.1
    use_residual: bool = True
    use_scale: bool = False
    relu_before_att: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        H, dh = self.num_heads, self.attention_dim // self.num_heads
        q = _dense(self.attention_dim, "W_q")(x)
        k = _dense(self.attention_dim, "W_k")(x)
        v = _dense(self.attention_dim, "W_v")(x)
        unary = _dense(H, "W_unary")(x)                       # [B, F, H]
        if self.relu_before_att:
            q, k, v = jax.nn.relu(q), jax.nn.relu(k), jax.nn.relu(v)
        B, F = x.shape[0], x.shape[1]
        # reference head "split" is a raw row-major view (DESTINE.py:203-
        # 217: `view(batch*heads, -1, head_dim)`), which interleaves heads
        # with fields rather than a transpose split — reproduced exactly
        split = lambda t: t.reshape(B * H, -1, dh)
        qh, kh, vh = split(q), split(k), split(v)
        mu_q = qh - qh.mean(axis=1, keepdims=True)
        mu_k = kh - kh.mean(axis=1, keepdims=True)
        pair = jnp.einsum("xqd,xkd->xqk", mu_q, mu_k)
        if self.use_scale:
            pair = pair / dh ** 0.5
        pair = jax.nn.softmax(pair, axis=-1)
        una = jax.nn.softmax(unary, axis=1).reshape(B * H, -1, 1)
        una = una.transpose(0, 2, 1)                          # [B*H, 1, F]
        attn = pair + una
        if self.dropout_rate > 0:
            attn = nn.Dropout(self.dropout_rate, deterministic=not train)(attn)
        out = jnp.einsum("xqk,xkd->xqd", attn, vh)
        out = out.reshape(B, F, self.attention_dim)
        if self.use_residual:
            out = out + _dense(self.attention_dim, "W_res")(x)
        return out


class _DESTINENet(nn.Module):
    """(ref: model_zoo/DESTINE/src/DESTINE.py:26-118)"""

    feature_map: Any
    embedding_dim: int = 10
    attention_dim: int = 16
    num_heads: int = 2
    attention_layers: int = 2
    dnn_hidden_units: Sequence[int] = ()
    dnn_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.1
    att_dropout: float = 0.1
    relu_before_att: bool = False
    batch_norm: bool = False
    use_scale: bool = False
    use_wide: bool = True
    residual_mode: str = "each_layer"

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        x = emb
        for i in range(self.attention_layers):
            x = _DisentangledSelfAttention(
                self.attention_dim, self.num_heads, self.att_dropout,
                self.residual_mode == "each_layer", self.use_scale,
                self.relu_before_att, name=f"self_attn_{i}")(x, train=train)
        if self.residual_mode == "last_layer":
            x = x + _dense(self.attention_dim, "W_res")(emb)
        y = _dense(1, "attn_fc")(_flat(x))
        if self.use_wide:
            y = y + LogisticRegression(self.feature_map,
                                       name="embedding_lr")(batch)
        if self.dnn_hidden_units:
            y = y + MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                              hidden_activations=self.dnn_activations,
                              output_dim=1, dropout_rates=self.net_dropout,
                              batch_norm=self.batch_norm,
                              name="dnn")(_flat(emb), train=train)
        return {"y_pred": y}


@register_model
class DESTINE(RankModel):
    """DESTINE (ref: model_zoo/DESTINE/src/DESTINE.py:26-230)."""

    def __init__(self, feature_map, model_id="DESTINE", learning_rate=1e-3,
                 embedding_dim=10, attention_dim=16, num_heads=2,
                 attention_layers=2, dnn_hidden_units=(), dnn_activations="relu",
                 net_dropout=0.1, att_dropout=0.1, relu_before_att=False,
                 batch_norm=False, use_scale=False, use_wide=True,
                 residual_mode="each_layer", **kwargs):
        net = _DESTINENet(feature_map, embedding_dim, attention_dim,
                          num_heads, attention_layers,
                          tuple(dnn_hidden_units) if dnn_hidden_units else (),
                          dnn_activations, net_dropout, att_dropout,
                          relu_before_att, batch_norm, use_scale, use_wide,
                          residual_mode)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- FinalMLP
class _FinalMLPNet(nn.Module):
    """FinalMLP (ref: model_zoo/FinalMLP/src/FinalMLP.py:28-235): two MLP
    streams with context-gated feature selection and multi-head bilinear
    fusion."""

    feature_map: Any
    embedding_dim: int = 10
    mlp1_hidden_units: Sequence[int] = (64, 64, 64)
    mlp1_hidden_activations: Union[str, Sequence[str]] = "relu"
    mlp1_dropout: float = 0.0
    mlp1_batch_norm: bool = False
    mlp2_hidden_units: Sequence[int] = (64, 64, 64)
    mlp2_hidden_activations: Union[str, Sequence[str]] = "relu"
    mlp2_dropout: float = 0.0
    mlp2_batch_norm: bool = False
    use_fs: bool = True
    fs_hidden_units: Sequence[int] = (64,)
    fs1_context: Sequence[str] = ()
    fs2_context: Sequence[str] = ()
    num_heads: int = 1

    def _fs_gate(self, batch, flat_emb, context, name):
        if context:
            ctx = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                   required_feature_columns=tuple(context),
                                   name=f"{name}_ctx")(batch,
                                                       flatten_emb=True)
        else:
            bias = self.param(f"{name}_bias", zeros_init,
                              (1, self.embedding_dim))
            ctx = jnp.broadcast_to(bias, (flat_emb.shape[0],
                                          self.embedding_dim))
        gate = MLP_Block(hidden_units=tuple(self.fs_hidden_units),
                         hidden_activations="relu",
                         output_dim=flat_emb.shape[-1],
                         output_activation="sigmoid",
                         name=f"{name}_gate")(ctx) * 2
        return flat_emb * gate

    @nn.compact
    def __call__(self, batch, train=False):
        flat_emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                    name="embedding")(batch, flatten_emb=True)
        if self.use_fs:
            feat1 = self._fs_gate(batch, flat_emb, self.fs1_context, "fs1")
            feat2 = self._fs_gate(batch, flat_emb, self.fs2_context, "fs2")
        else:
            feat1 = feat2 = flat_emb
        o1 = MLP_Block(hidden_units=tuple(self.mlp1_hidden_units),
                       hidden_activations=self.mlp1_hidden_activations,
                       dropout_rates=self.mlp1_dropout,
                       batch_norm=self.mlp1_batch_norm,
                       name="mlp1")(feat1, train=train)
        o2 = MLP_Block(hidden_units=tuple(self.mlp2_hidden_units),
                       hidden_activations=self.mlp2_hidden_activations,
                       dropout_rates=self.mlp2_dropout,
                       batch_norm=self.mlp2_batch_norm,
                       name="mlp2")(feat2, train=train)
        # InteractionAggregation (FinalMLP.py:194-235)
        H = self.num_heads
        dx, dy = o1.shape[-1] // H, o2.shape[-1] // H
        y = _dense(1, "w_x")(o1) + _dense(1, "w_y")(o2)
        w_xy = self.param("w_xy", xavier_normal(), (H * dx * dy, 1))
        hx = o1.reshape(-1, H, dx)
        hy = o2.reshape(-1, H, dy)
        w = w_xy.reshape(H, dx, dy)
        xy = jnp.einsum("bhx,hxy,bhy->bh", hx, w, hy)
        y = y + jnp.sum(xy, axis=1, keepdims=True)
        return {"y_pred": y}


@register_model
class FinalMLP(RankModel):
    """FinalMLP (ref: model_zoo/FinalMLP/src/FinalMLP.py:28-235)."""

    def __init__(self, feature_map, model_id="FinalMLP", learning_rate=1e-3,
                 embedding_dim=10, mlp1_hidden_units=(64, 64, 64),
                 mlp1_hidden_activations="relu", mlp1_dropout=0.0,
                 mlp1_batch_norm=False, mlp2_hidden_units=(64, 64, 64),
                 mlp2_hidden_activations="relu", mlp2_dropout=0.0,
                 mlp2_batch_norm=False, use_fs=True, fs_hidden_units=(64,),
                 fs1_context=(), fs2_context=(), num_heads=1, **kwargs):
        net = _FinalMLPNet(feature_map, embedding_dim,
                           tuple(mlp1_hidden_units), mlp1_hidden_activations,
                           mlp1_dropout, mlp1_batch_norm,
                           tuple(mlp2_hidden_units), mlp2_hidden_activations,
                           mlp2_dropout, mlp2_batch_norm, use_fs,
                           tuple(fs_hidden_units), tuple(fs1_context),
                           tuple(fs2_context), num_heads)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- FinalNet
class _FactorizedInteraction(nn.Module):
    """(ref: model_zoo/FinalNet/src/FinalNet.py:262-295)"""

    output_dim: int
    residual_type: str = "sum"

    @nn.compact
    def __call__(self, x):
        out_dim = self.output_dim * 2 if self.residual_type == "sum" \
            else self.output_dim
        h = _dense(out_dim, "linear")(x)
        h2, h1 = jnp.split(h, 2, axis=-1)
        if self.residual_type == "concat":
            return jnp.concatenate([h2, h1 * h2], axis=-1)
        return h2 + h1 * h2


class _FinalBlock(nn.Module):
    """(ref: model_zoo/FinalNet/src/FinalNet.py:207-260)"""

    hidden_units: Sequence[int]
    hidden_activations: Union[str, Sequence[str], None] = None
    dropout_rates: Union[float, Sequence[float]] = 0.0
    batch_norm: bool = True
    residual_type: str = "concat"

    @nn.compact
    def __call__(self, x, train=False):
        n = len(self.hidden_units)
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * n
        drops = self.dropout_rates
        if not isinstance(drops, (list, tuple)):
            drops = [drops] * n
        for i, units in enumerate(self.hidden_units):
            x = _FactorizedInteraction(units, self.residual_type,
                                       name=f"fi_{i}")(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"bn_{i}")(x)
            if acts[i]:
                x = Activation(acts[i], hidden_dim=units)(x, train=train)
            if drops[i] > 0:
                x = nn.Dropout(drops[i], deterministic=not train)(x)
        return x


class _FinalNetNet(nn.Module):
    """FinalNet (ref: model_zoo/FinalNet/src/FinalNet.py:25-205): 1 or 2
    factorized-interaction blocks, optional field gating, self-distillation
    aux losses in 2B mode (handled via aux outputs y1/y2)."""

    feature_map: Any
    embedding_dim: int = 10
    block_type: str = "2B"
    batch_norm: bool = True
    use_feature_gating: bool = False
    block1_hidden_units: Sequence[int] = (64, 64, 64)
    block1_hidden_activations: Any = None
    block1_dropout: float = 0.0
    block2_hidden_units: Sequence[int] = (64, 64, 64)
    block2_hidden_activations: Any = None
    block2_dropout: float = 0.0
    residual_type: str = "concat"

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        x1 = emb
        if self.use_feature_gating:
            # field gating with residual concat (FinalNet.py:172-205)
            gates = _dense(F, "gate")(emb.transpose(0, 2, 1)).transpose(0, 2, 1)
            x1 = jnp.concatenate([emb, emb * gates], axis=1)
        y1 = _dense(1, "fc1")(_FinalBlock(
            tuple(self.block1_hidden_units), self.block1_hidden_activations,
            self.block1_dropout, self.batch_norm, self.residual_type,
            name="block1")(_flat(x1), train=train))
        if self.block_type == "1B":
            return {"y_pred": y1}
        y2 = _dense(1, "fc2")(_FinalBlock(
            tuple(self.block2_hidden_units), self.block2_hidden_activations,
            self.block2_dropout, self.batch_norm, self.residual_type,
            name="block2")(_flat(emb), train=train))
        y_pred = 0.5 * (y1 + y2)
        # self-distillation: BCE(yk, sigmoid(y_pred).detach())
        import optax
        target = jax.lax.stop_gradient(jax.nn.sigmoid(y_pred))
        aux = (optax.sigmoid_binary_cross_entropy(y1, target).mean()
               + optax.sigmoid_binary_cross_entropy(y2, target).mean())
        return {"y_pred": y_pred, "aux_loss": aux}


@register_model
class FinalNet(RankModel):
    """FinalNet (ref: model_zoo/FinalNet/src/FinalNet.py:25-295)."""

    def __init__(self, feature_map, model_id="FinalNet", learning_rate=1e-3,
                 embedding_dim=10, block_type="2B", batch_norm=True,
                 use_feature_gating=False, block1_hidden_units=(64, 64, 64),
                 block1_hidden_activations=None, block1_dropout=0.0,
                 block2_hidden_units=(64, 64, 64),
                 block2_hidden_activations=None, block2_dropout=0.0,
                 residual_type="concat", **kwargs):
        assert block_type in ("1B", "2B")
        net = _FinalNetNet(feature_map, embedding_dim, block_type, batch_norm,
                           use_feature_gating, tuple(block1_hidden_units),
                           block1_hidden_activations, block1_dropout,
                           tuple(block2_hidden_units),
                           block2_hidden_activations, block2_dropout,
                           residual_type)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ---------------------------------------------------------------- EulerNet
class _EulerInteractionLayer(nn.Module):
    """(ref: model_zoo/EulerNet/src/EulerNet.py:95-160)"""

    out_fields: int
    feature_dim: int
    apply_norm: bool = False
    net_ex_dropout: float = 0.0
    net_im_dropout: float = 0.0

    @nn.compact
    def __call__(self, r, p, train=False):
        D = self.feature_dim
        B = r.shape[0]
        in_fields = r.shape[1] * r.shape[2] // D // r.shape[1] * r.shape[1] \
            if False else (r.size // (B * D))
        r = r.reshape(B, -1, D)
        p = p.reshape(B, -1, D)
        in_fields = r.shape[1]
        lam = r ** 2 + p ** 2 + 1e-8
        theta = jnp.arctan2(p, r)
        lam = 0.5 * jnp.log(lam)
        lam = nn.Dropout(self.net_ex_dropout, deterministic=not train)(lam)
        theta = nn.Dropout(self.net_ex_dropout, deterministic=not train)(theta)
        if in_fields == self.out_fields:
            orders_init = lambda k, s: jnp.eye(s[0], s[1])
        else:
            orders_init = lambda k, s: jax.nn.softmax(
                jax.random.normal(k, s) / 0.01, axis=0)
        orders = self.param("inter_orders", orders_init,
                            (in_fields, self.out_fields))
        bias_lam = self.param("bias_lam",
                              jax.nn.initializers.normal(0.01),
                              (1, D, self.out_fields))
        bias_theta = self.param("bias_theta",
                                jax.nn.initializers.normal(0.01),
                                (1, D, self.out_fields))
        lam_t = lam.transpose(0, 2, 1) @ orders + bias_lam
        theta_t = theta.transpose(0, 2, 1) @ orders + bias_theta
        lam_t = jnp.exp(lam_t)
        lam_t = lam_t.transpose(0, 2, 1)
        theta_t = theta_t.transpose(0, 2, 1)
        rf = nn.Dropout(self.net_im_dropout, deterministic=not train)(
            r.reshape(B, -1))
        pf = nn.Dropout(self.net_im_dropout, deterministic=not train)(
            p.reshape(B, -1))
        im = nn.Dense(self.out_fields * D,
                      kernel_init=jax.nn.initializers.glorot_uniform(),
                      name="im")
        rf, pf = jax.nn.relu(im(rf)), jax.nn.relu(im(pf))
        rf = rf.reshape(B, -1, D)
        pf = pf.reshape(B, -1, D)
        o_r = rf + lam_t * jnp.cos(theta_t)
        o_p = pf + lam_t * jnp.sin(theta_t)
        if self.apply_norm:
            o_r = nn.LayerNorm(epsilon=1e-5, name="norm_r")(o_r)
            o_p = nn.LayerNorm(epsilon=1e-5, name="norm_p")(o_p)
        return o_r, o_p


class _EulerNetNet(nn.Module):
    """EulerNet (ref: model_zoo/EulerNet/src/EulerNet.py:23-160): complex-
    plane (Euler form) interactions."""

    feature_map: Any
    embedding_dim: int = 10
    shape: Sequence[int] = (3,)
    net_ex_dropout: float = 0.0
    net_im_dropout: float = 0.0
    layer_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        F = self.feature_map.num_fields
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch)
        mu = self.param("mu", nn.initializers.ones, (1, F, 1))
        r, p = mu * jnp.cos(emb), mu * jnp.sin(emb)
        for i, n_out in enumerate(self.shape):
            r, p = _EulerInteractionLayer(
                n_out, self.embedding_dim, self.layer_norm,
                self.net_ex_dropout, self.net_im_dropout,
                name=f"euler_{i}")(r, p, train=train)
        reg = _dense(1, "reg")
        y = reg(_flat(r)) + reg(_flat(p))
        return {"y_pred": y}


@register_model
class EulerNet(RankModel):
    """EulerNet (ref: model_zoo/EulerNet/src/EulerNet.py:23-160)."""

    def __init__(self, feature_map, model_id="EulerNet", learning_rate=1e-3,
                 embedding_dim=10, shape=(3,), net_ex_dropout=0.0,
                 net_im_dropout=0.0, layer_norm=False, **kwargs):
        net = _EulerNetNet(feature_map, embedding_dim, tuple(shape),
                           net_ex_dropout, net_im_dropout, layer_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------ WuKong
class _WuKongLayer(nn.Module):
    """(ref: model_zoo/WuKong/src/WuKong.py:123-230): FMB (low-rank FM
    matrix → MLP) + LCB (linear field compression), residual + LN."""

    lcb_features: int = 40
    fmb_features: int = 40
    embedding_dim: int = 64
    fmp_rank_k: int = 8
    fmb_mlp_units: Sequence[int] = (32, 32)
    fmb_mlp_activations: str = "relu"
    fmb_dropout: float = 0.0
    layer_norm: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        B, n, d = x.shape
        if self.fmp_rank_k is not None:
            proj = self.param("proj_Y", jax.nn.initializers.normal(1.0),
                              (n, self.fmp_rank_k))
            fm_matrix = jnp.einsum("bnd,bdk->bnk", x,
                                   x.transpose(0, 2, 1) @ proj)
        else:
            fm_matrix = jnp.einsum("bnd,bmd->bnm", x, x)
        fm_flat = nn.LayerNorm(epsilon=1e-5, name="fm_ln")(_flat(fm_matrix))
        fmb = MLP_Block(hidden_units=tuple(self.fmb_mlp_units),
                        hidden_activations=self.fmb_mlp_activations,
                        output_dim=self.fmb_features * d,
                        output_activation="relu",
                        dropout_rates=self.fmb_dropout,
                        name="fmb_mlp")(fm_flat, train=train)
        fmb = fmb.reshape(B, self.fmb_features, d)
        lcb = _dense(self.lcb_features, "lcb", use_bias=False)(
            x.transpose(0, 2, 1)).transpose(0, 2, 1)
        out = jnp.concatenate([fmb, lcb], axis=1)
        n_out = self.lcb_features + self.fmb_features
        if n != n_out:
            res = _dense(n_out, "residual_proj")(
                x.transpose(0, 2, 1)).transpose(0, 2, 1)
        else:
            res = x
        out = out + res
        if self.layer_norm:
            out = nn.LayerNorm(epsilon=1e-5, name="ln")(out)
        return out


class _WuKongNet(nn.Module):
    """WuKong (ref: model_zoo/WuKong/src/WuKong.py:28-230)."""

    feature_map: Any
    embedding_dim: int = 64
    num_wukong_layers: int = 3
    lcb_features: int = 40
    fmb_features: int = 40
    fmb_mlp_units: Sequence[int] = (32, 32)
    fmb_mlp_activations: str = "relu"
    fmp_rank_k: int = 8
    mlp_hidden_units: Sequence[int] = (32, 32)
    mlp_hidden_activations: str = "relu"
    mlp_batch_norm: bool = True
    layer_norm: bool = True
    net_dropout: float = 0.0

    @nn.compact
    def __call__(self, batch, train=False):
        x = FeatureEmbedding(self.feature_map, self.embedding_dim,
                             name="embedding")(batch)
        for i in range(self.num_wukong_layers):
            x = _WuKongLayer(self.lcb_features, self.fmb_features,
                             self.embedding_dim, self.fmp_rank_k,
                             tuple(self.fmb_mlp_units),
                             self.fmb_mlp_activations, self.net_dropout,
                             self.layer_norm, name=f"wukong_{i}")(
                                 x, train=train)
        y = MLP_Block(hidden_units=tuple(self.mlp_hidden_units),
                      hidden_activations=self.mlp_hidden_activations,
                      output_dim=1, batch_norm=self.mlp_batch_norm,
                      name="fc")(_flat(x), train=train)
        return {"y_pred": y}


@register_model
class WuKong(RankModel):
    """WuKong (ref: model_zoo/WuKong/src/WuKong.py:28-230)."""

    def __init__(self, feature_map, model_id="WuKong", learning_rate=1e-3,
                 embedding_dim=64, num_wukong_layers=3, lcb_features=40,
                 fmb_features=40, fmb_mlp_units=(32, 32),
                 fmb_mlp_activations="relu", fmp_rank_k=8,
                 mlp_hidden_units=(32, 32), mlp_hidden_activations="relu",
                 mlp_batch_norm=True, layer_norm=True, net_dropout=0.0,
                 **kwargs):
        net = _WuKongNet(feature_map, embedding_dim, num_wukong_layers,
                         lcb_features, fmb_features, tuple(fmb_mlp_units),
                         fmb_mlp_activations, fmp_rank_k,
                         tuple(mlp_hidden_units), mlp_hidden_activations,
                         mlp_batch_norm, layer_norm, net_dropout)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- QNN
class _QNNNet(nn.Module):
    """QNN (ref: model_zoo/QNN/src/QNN.py:20-200): quadratic neuron layers.
    Implemented neuron types: T1 (bilinear+linear on a 100-dim compressed
    space), T2 (bilinear only), T3 (linear(x∘x))."""

    feature_map: Any
    embedding_dim: int = 16
    num_cross_layers: int = 3
    net_dropout: float = 0.0
    batch_norm: bool = False
    hidden_activations: str = "relu"
    neuron_type: str = "T1"

    @nn.compact
    def __call__(self, batch, train=False):
        x = FeatureEmbedding(self.feature_map, self.embedding_dim,
                             name="embedding")(batch, flatten_emb=True)
        t = self.neuron_type
        if t in ("T1", "T2"):
            x = _dense(100, "compressed", use_bias=False)(x)
        for i in range(self.num_cross_layers):
            dim = x.shape[-1]
            if t in ("T1", "T2"):
                W = self.param(f"bilinear_{i}", xavier_normal(),
                               (dim, dim, dim))
                bb = self.param(f"bilinear_b_{i}", zeros_init, (dim,))
                h = jnp.einsum("bi,oij,bj->bo", x, W, x) + bb
                if t == "T1":
                    h = h + _dense(dim, f"linear_{i}")(x)
                x = h
            elif t == "T3":
                x = _dense(dim, f"linear_{i}")(x * x)
            else:
                raise NotImplementedError(
                    f"neuron_type={t} is not supported.")
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"bn_{i}")(x)
            x = Activation(self.hidden_activations,
                           hidden_dim=x.shape[-1])(x, train=train)
            if self.net_dropout > 0:
                x = nn.Dropout(self.net_dropout, deterministic=not train)(x)
        return {"y_pred": _dense(1, "fc")(x)}


@register_model
class QNN(RankModel):
    """QNN (ref: model_zoo/QNN/src/QNN.py:20-200)."""

    def __init__(self, feature_map, model_id="QNN", learning_rate=1e-3,
                 embedding_dim=16, num_cross_layers=3, net_dropout=0.0,
                 batch_norm=False, hidden_activations="relu",
                 neuron_type="T1", **kwargs):
        net = _QNNNet(feature_map, embedding_dim, num_cross_layers,
                      net_dropout, batch_norm, hidden_activations,
                      neuron_type)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
