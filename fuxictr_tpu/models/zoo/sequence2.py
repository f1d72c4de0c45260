"""Behavior-sequence models, part 2: DMIN and DMR."""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.models.zoo.sequence import (_as_list, _concat_field_emb,
                                             _field_names)
from fuxictr_tpu.ops.attention import scaled_dot_product_attention
from fuxictr_tpu.ops.common import Activation, xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.mlp import MLP_Block
from fuxictr_tpu.ops.pooling import masked_sum_pool

_NEG_INF = -1.0e9


def _dense(units, name, use_bias=True):
    return nn.Dense(units, use_bias=use_bias, kernel_init=xavier_normal(),
                    bias_init=zeros_init, name=name)


def _attn_mask(valid, causal=False):
    """[B, L, L]: attend to valid positions; diagonal always on (so fully
    padded rows stay finite); optional causal triangle (DMIN.py:218-240
    always applies causal + diagonal-allowed)."""
    L = valid.shape[1]
    m = jnp.broadcast_to(valid[:, None, :], (valid.shape[0], L, L))
    m = m | jnp.eye(L, dtype=bool)[None]
    if causal:
        m = m & ~jnp.triu(jnp.ones((L, L), bool), 1)[None]
        m = m | jnp.eye(L, dtype=bool)[None]
    return m


# ------------------------------------------------------------------- DMIN
class _DMINNet(nn.Module):
    """DMIN (ref: model_zoo/DMIN/src/DMIN.py): behavior refiner (MHSA+FFN)
    → multi-head interest extractor, each head DIN-attended to the target
    with positional embeddings; optional DIEN-style aux loss on refined
    states."""

    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    aux_hidden_units: Sequence[int] = (100, 50)
    aux_activation: str = "relu"
    net_dropout: float = 0.0
    target_field: Any = None
    sequence_field: Any = None
    neg_seq_field: Any = None
    num_heads: int = 4
    enable_sum_pooling: bool = False
    attention_hidden_units: Sequence[int] = (80, 40)
    attention_activation: str = "relu"
    attention_dropout: float = 0.0
    use_pos_emb: bool = True
    pos_emb_dim: int = 8
    use_behavior_refiner: bool = True
    aux_loss_lambda: float = 0.0
    batch_norm: bool = True
    layer_norm: bool = True

    def _refine(self, idx, x, attn_mask, train):
        """MHSA + FFN with residual/LN (DMIN.py BehaviorRefinerLayer).

        The reference passes its boolean allowed-mask to torch
        MultiheadAttention as ``1 - mask.float()`` (DMIN.py:327) — a FLOAT
        mask, which torch treats as an ADDITIVE bias: blocked positions
        get scores + 1.0 instead of -inf. Reproduced bit-for-bit."""
        D = x.shape[-1]
        H = self.num_heads
        dh = D // H
        qkv = _dense(3 * D, f"refiner_qkv_{idx}")(x)   # torch MHA in_proj
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(t.shape[0], -1, H, dh).transpose(0, 2, 1, 3)
        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (dh ** 0.5)
        scores = scores + (1.0 - attn_mask[:, None].astype(scores.dtype))
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape)
        out = _dense(D, f"refiner_o_{idx}")(out)
        if self.net_dropout > 0:
            out = nn.Dropout(self.net_dropout, deterministic=not train)(out)
        s = out + x
        if self.layer_norm:
            s = nn.LayerNorm(epsilon=1e-5, name=f"refiner_ln_{idx}")(s)
        h = _dense(D, f"refiner_ffn2_{idx}")(
            jax.nn.relu(_dense(2 * D, f"refiner_ffn1_{idx}")(s)))
        return h + s

    def _target_attention(self, name, sequence_emb, target_emb, pad_mask,
                          train):
        """DIN attention with positional-embedding-augmented target."""
        B, L, D = sequence_emb.shape
        t = jnp.broadcast_to(target_emb[:, None, :], (B, L, D))
        if self.use_pos_emb:
            pos = self.param(f"{name}_pos", zeros_init,
                             (L, self.pos_emb_dim))
            t = jnp.concatenate(
                [t, jnp.broadcast_to(pos[None], (B, L, self.pos_emb_dim))],
                axis=-1)
            t = _dense(D, f"{name}_proj")(t)
        concat = jnp.concatenate([t, sequence_emb, t - sequence_emb,
                                  t * sequence_emb], axis=-1)
        score = MLP_Block(hidden_units=tuple(self.attention_hidden_units),
                          hidden_activations=self.attention_activation,
                          output_dim=1, dropout_rates=self.attention_dropout,
                          name=f"{name}_mlp")(concat, train=train)[..., 0]
        score = jnp.where(pad_mask, score, _NEG_INF)
        score = jax.nn.softmax(score, axis=-1)
        return jnp.einsum("bl,bld->bd", score, sequence_emb)

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        target_fields = _as_list(self.target_field)
        sequence_fields = _as_list(self.sequence_field)
        neg_fields = _as_list(self.neg_seq_field) if self.neg_seq_field \
            else [None] * len(target_fields)
        concat_emb = []
        aux_total = 0.0
        skip = set()
        for nf in neg_fields:
            if nf is not None:
                skip.update(_field_names(nf))
        for i, (t_field, s_field, n_field) in enumerate(
                zip(target_fields, sequence_fields, neg_fields)):
            target_emb = _concat_field_emb(emb_dict, t_field)
            sequence_emb = _concat_field_emb(emb_dict, s_field)
            seq_name = _field_names(s_field)[0]
            pad_mask = jnp.asarray(batch[seq_name]) > 0
            am = _attn_mask(pad_mask, causal=True)
            refined = self._refine(i, sequence_emb, am, train) \
                if self.use_behavior_refiner else sequence_emb
            # multi-interest extractor: shared QKV, per-head towers
            D = refined.shape[-1]
            H = self.num_heads
            dh = D // H
            qkv = _dense(3 * D, f"mie_qkv_{i}", use_bias=False)(refined)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            split = lambda t: t.reshape(t.shape[0], -1, H, dh).transpose(
                0, 2, 1, 3)
            heads, _ = scaled_dot_product_attention(
                split(q), split(k), split(v), scale=dh ** 0.5,
                mask=am[:, None])                            # [B, H, L, dh]
            for h in range(H):
                s = _dense(D, f"mie_o_{i}_{h}", use_bias=False)(heads[:, h])
                if self.net_dropout > 0:
                    s = nn.Dropout(self.net_dropout,
                                   deterministic=not train)(s)
                s = s + refined
                if self.layer_norm:
                    s = nn.LayerNorm(epsilon=1e-5, name=f"mie_ln_{i}_{h}")(s)
                head_out = _dense(D, f"mie_ffn2_{i}_{h}")(
                    jax.nn.relu(_dense(2 * D, f"mie_ffn1_{i}_{h}")(s))) + s
                concat_emb.append(self._target_attention(
                    f"ta_{i}_{h}", head_out, target_emb, pad_mask, train))
            if self.enable_sum_pooling:
                sum_pool = masked_sum_pool(
                    sequence_emb, jnp.any(sequence_emb != 0, axis=-1))
                concat_emb += [sum_pool, target_emb * sum_pool]
            if self.aux_loss_lambda > 0 and n_field is not None:
                neg_emb = _concat_field_emb(emb_dict, n_field)
                aux_total = aux_total + self._aux_loss(
                    i, refined, sequence_emb, neg_emb, pad_mask, train)
        for name, emb in emb_dict.items():
            if emb.ndim == 2 and name not in skip:
                concat_emb.append(emb)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(jnp.concatenate(concat_emb, axis=-1),
                                  train=train)
        outputs = {"y_pred": y}
        if self.aux_loss_lambda > 0:
            outputs["aux_loss"] = aux_total
        return outputs

    def _aux_loss(self, idx, head_emb, pos_emb, neg_emb, mask, train):
        D = head_emb.shape[-1]
        aux_net = MLP_Block(hidden_units=tuple(self.aux_hidden_units),
                            hidden_activations=self.aux_activation,
                            output_dim=1, output_activation="sigmoid",
                            name=f"aux_net_{idx}")
        pos_in = jnp.concatenate([head_emb[:, :-1], pos_emb[:, 1:]], axis=-1)
        neg_in = jnp.concatenate([head_emb[:, :-1], neg_emb[:, 1:]], axis=-1)
        pos_p = aux_net(pos_in.reshape(-1, 2 * D), train=train).reshape(-1)
        neg_p = aux_net(neg_in.reshape(-1, 2 * D), train=train).reshape(-1)
        eps = 1e-7
        bce = -(jnp.log(pos_p + eps) + jnp.log(1 - neg_p + eps))
        m = mask[:, 1:].astype(bce.dtype).reshape(-1)
        return self.aux_loss_lambda * jnp.sum(bce * m) / (jnp.sum(m) + 1e-9)


@register_model
class DMIN(RankModel):
    """DMIN (ref: model_zoo/DMIN/src/DMIN.py)."""

    _requires_sequence = True

    def __init__(self, feature_map, model_id="DMIN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", aux_hidden_units=(100, 50),
                 aux_activation="relu", net_dropout=0.0,
                 target_field=("item_id", "cate_id"),
                 sequence_field=("click_history", "cate_history"),
                 neg_seq_field=None, num_heads=4, enable_sum_pooling=False,
                 attention_hidden_units=(80, 40), attention_activation="relu",
                 attention_dropout=0.0, use_pos_emb=True, pos_emb_dim=8,
                 use_behavior_refiner=True, aux_loss_lambda=0.0,
                 batch_norm=True, layer_norm=True, **kwargs):
        net = _DMINNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                       dnn_activations, tuple(aux_hidden_units),
                       aux_activation, net_dropout, target_field,
                       sequence_field, neg_seq_field, num_heads,
                       enable_sum_pooling, tuple(attention_hidden_units),
                       attention_activation, attention_dropout, use_pos_emb,
                       pos_emb_dim, use_behavior_refiner, aux_loss_lambda,
                       batch_norm, layer_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- DMR
class _DMRNet(nn.Module):
    """DMR (ref: model_zoo/DMR/src/DMR.py:27-460): item-to-item attention
    (rel_i2i) + user-to-item network with its own output-vocab embeddings
    (rel_u2i) and an optional next-item aux loss. Assumes pre-padded
    sequences (most recent behavior last)."""

    feature_map: Any
    embedding_dim: int = 10
    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = True
    target_field: Any = None
    sequence_field: Any = None
    neg_seq_field: Any = None
    context_field: Any = None
    enable_sum_pooling: bool = False
    enable_u2i_rel: bool = True
    enable_i2i_rel: bool = False
    attention_hidden_units: Sequence[int] = (80, 40)
    attention_activation: str = "relu"
    attention_dropout: float = 0.0
    use_pos_emb: bool = True
    pos_emb_dim: int = 8
    aux_loss_beta: float = 0.0

    def _din_score(self, name, query, sequence_emb, train):
        concat = jnp.concatenate([query, sequence_emb, query - sequence_emb,
                                  query * sequence_emb], axis=-1)
        return MLP_Block(hidden_units=tuple(self.attention_hidden_units),
                         hidden_activations=self.attention_activation,
                         output_dim=1, dropout_rates=self.attention_dropout,
                         name=f"{name}_mlp")(concat, train=train)[..., 0]

    def _out_emb(self, tables, field, target_field, batch):
        embs = []
        for input_name, emb_name in zip(_field_names(field),
                                        _field_names(target_field)):
            ids = jnp.asarray(batch[input_name]).astype(jnp.int32)
            e = tables[emb_name](ids)
            pad = self.feature_map.features[emb_name].get("padding_idx", 0)
            if pad is not None and pad >= 0:
                e = e * (ids != pad)[..., None].astype(e.dtype)
            embs.append(e)
        return jnp.concatenate(embs, axis=-1)

    @nn.compact
    def __call__(self, batch, train=False):
        target_fields = _as_list(self.target_field)
        sequence_fields = _as_list(self.sequence_field)
        neg_fields = _as_list(self.neg_seq_field) if self.neg_seq_field \
            else [None] * len(target_fields)
        context_fields = _as_list(self.context_field) if self.context_field \
            else [None] * len(target_fields)
        skip = set()
        for nf in neg_fields:
            if nf is not None:
                skip.update(_field_names(nf))
        emb_layer = FeatureEmbedding(
            self.feature_map, self.embedding_dim,
            not_required_feature_columns=tuple(skip) or None,
            name="embedding")
        emb_dict = emb_layer.embedding_dict(batch, train=train)
        # output-vocab embeddings (separate tables, DMR.py:120-135)
        out_tables = {}
        for t_field in target_fields:
            for feat in _field_names(t_field):
                spec = self.feature_map.features[feat]
                out_tables[feat] = nn.Embed(
                    spec["vocab_size"], self.embedding_dim,
                    embedding_init=jax.nn.initializers.normal(1e-4),
                    name=f"out_emb_{feat}")
        ctx_tables = {}
        for c_field in context_fields:
            if c_field is not None:
                for feat in _field_names(c_field):
                    spec = self.feature_map.features[feat]
                    ctx_tables[feat] = nn.Embed(
                        spec["vocab_size"], self.embedding_dim,
                        embedding_init=jax.nn.initializers.normal(1e-4),
                        name=f"ctx_emb_{feat}")
        concat_emb = []
        aux_total = 0.0
        for i, (t_field, s_field, n_field, c_field) in enumerate(
                zip(target_fields, sequence_fields, neg_fields,
                    context_fields)):
            target_emb = _concat_field_emb(emb_dict, t_field)
            sequence_emb = _concat_field_emb(emb_dict, s_field)
            seq_name = _field_names(s_field)[0]
            pad_mask = jnp.asarray(batch[seq_name]) > 0
            B, L, D = sequence_emb.shape
            context_emb = _concat_field_emb(emb_dict, c_field) \
                if c_field is not None else None

            # ---- Item2Item net (DMR.py:382-460)
            ctx = jnp.broadcast_to(target_emb[:, None, :], (B, L, D))
            if context_emb is not None:
                ctx = jnp.concatenate([ctx, context_emb], axis=-1)
            if self.use_pos_emb:
                pos = self.param(f"i2i_pos_{i}", zeros_init,
                                 (L, self.pos_emb_dim))
                ctx = jnp.concatenate(
                    [ctx, jnp.broadcast_to(pos[None],
                                           (B, L, self.pos_emb_dim))],
                    axis=-1)
            # ref W_q = Linear(+bias) + ReLU (DMR.py:309-310)
            query = jax.nn.relu(_dense(D, f"i2i_Wq_{i}")(ctx))
            score = self._din_score(f"i2i_{i}", query, sequence_emb, train)
            soft = jax.nn.softmax(
                jnp.where(pad_mask, score, _NEG_INF), axis=-1)
            attn_out = jnp.einsum("bl,bld->bd", soft, sequence_emb)
            concat_emb.append(attn_out)
            if self.enable_i2i_rel:
                rel_i2i = jnp.sum(score * pad_mask.astype(score.dtype),
                                  axis=1, keepdims=True)
                concat_emb.append(rel_i2i)

            # ---- User2Item net (DMR.py:290-380)
            if self.enable_u2i_rel:
                target2 = self._out_emb(out_tables, t_field, t_field, batch)
                seq2 = self._out_emb(out_tables, s_field, t_field, batch)
                pos_u = self.param(f"u2i_pos_{i}", zeros_init,
                                   (L, self.pos_emb_dim))
                uctx = jnp.broadcast_to(pos_u[None], (B, L, self.pos_emb_dim))
                if c_field is not None:
                    ctx2 = jnp.concatenate(
                        [ctx_tables[f](jnp.asarray(batch[f]).astype(jnp.int32))
                         for f in _field_names(c_field)], axis=-1)
                    uctx = jnp.concatenate([uctx, ctx2], axis=-1)
                uquery = jax.nn.relu(_dense(D, f"u2i_Wq_{i}")(uctx))
                uscore = self._din_score(f"u2i_{i}", uquery, sequence_emb,
                                         train)
                # causal per-position attention over valid prefix + diagonal
                am = _attn_mask(pad_mask) & jnp.tril(
                    jnp.ones((L, L), bool))[None]
                am = am | jnp.eye(L, dtype=bool)[None]
                expand = jnp.where(am, uscore[:, None, :], _NEG_INF)
                expand = jax.nn.softmax(expand, axis=-1)
                user_embs = jnp.einsum("bql,bld->bqd", expand, sequence_emb)
                user_embs = jax.nn.relu(
                    _dense(D, f"u2i_Wo_{i}")(user_embs))   # Linear+ReLU
                rel_u2i = jnp.sum(user_embs[:, -1, :] * target2, axis=-1,
                                  keepdims=True)
                concat_emb.append(rel_u2i)
                if self.aux_loss_beta > 0 and n_field is not None:
                    neg2 = self._out_emb(out_tables, n_field, t_field, batch)
                    if neg2.ndim == 3:
                        neg2 = neg2[:, -1, :]
                    pos_p = jax.nn.sigmoid(jnp.sum(
                        user_embs[:, -2, :] * seq2[:, -1, :], axis=-1))
                    neg_p = jax.nn.sigmoid(jnp.sum(
                        user_embs[:, -2, :] * neg2, axis=-1))
                    eps = 1e-7
                    bce = -jnp.log(pos_p + eps) - jnp.log(1 - neg_p + eps)
                    m = pad_mask[:, -1].astype(bce.dtype)
                    aux_total = aux_total + self.aux_loss_beta * (
                        jnp.sum(bce * m) / jnp.maximum(jnp.sum(m), 1.0))
            if self.enable_sum_pooling:
                sum_pool = masked_sum_pool(
                    sequence_emb, jnp.any(sequence_emb != 0, axis=-1))
                concat_emb += [sum_pool, target_emb * sum_pool]
        for name, emb in emb_dict.items():
            if emb.ndim == 2 and name not in skip:
                concat_emb.append(emb)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(jnp.concatenate(concat_emb, axis=-1),
                                  train=train)
        outputs = {"y_pred": y}
        if self.aux_loss_beta > 0:
            outputs["aux_loss"] = aux_total
        return outputs


@register_model
class DMR(RankModel):
    """DMR (ref: model_zoo/DMR/src/DMR.py:27-460)."""

    _requires_sequence = True

    def __init__(self, feature_map, model_id="DMR", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", net_dropout=0.0, batch_norm=True,
                 target_field=("item_id", "cate_id"),
                 sequence_field=("click_history", "cate_history"),
                 neg_seq_field=None, context_field=None,
                 enable_sum_pooling=False, enable_u2i_rel=True,
                 enable_i2i_rel=False, attention_hidden_units=(80, 40),
                 attention_activation="relu", attention_dropout=0.0,
                 use_pos_emb=True, pos_emb_dim=8, aux_loss_beta=0.0,
                 **kwargs):
        net = _DMRNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                      dnn_activations, net_dropout, batch_norm, target_field,
                      sequence_field, neg_seq_field, context_field,
                      enable_sum_pooling, enable_u2i_rel, enable_i2i_rel,
                      tuple(attention_hidden_units), attention_activation,
                      attention_dropout, use_pos_emb, pos_emb_dim,
                      aux_loss_beta)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
