"""Long-sequence CTR models: SIM, ETA, SDIM, TWIN, MIRRN.

Scaling is algorithmic (two-stage retrieval / LSH / top-k attention inside
the model — SURVEY.md §5), implemented with fully static shapes:
``jax.lax.top_k`` for retrieval and dense collision-mask matmuls instead of
the reference's embedding_bag over dynamic nonzero indices.

Batch layout (see data/longctr_loader.py): flat user/context features +
``"__items__"`` item-feature dict of [B*(L+1)] arrays (history + target) +
``"__seq_mask__"`` [B, L].
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.data.longctr_loader import ITEMS_KEY, SEQ_MASK_KEY
from fuxictr_tpu.models.base import RankModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.attention import MultiHeadTargetAttention
from fuxictr_tpu.ops.common import xavier_normal, zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.mlp import MLP_Block

_NEG_INF = -1.0e9


def _dense(units, name, use_bias=True):
    return nn.Dense(units, use_bias=use_bias, kernel_init=xavier_normal(),
                    bias_init=zeros_init, name=name)


class _LongCTRBase(nn.Module):
    """Shared front-end: embed user/context batch features (flattened) and
    the item table reshaped to [B, L+1, item_dim]; split target/short/long
    views (cf. SIM.py:124-168)."""

    feature_map: Any
    embedding_dim: int

    def _item_info_dim(self):
        dim = 0
        for feat, spec in self.feature_map.features.items():
            if spec.get("source") == "item":
                dim += spec.get("embedding_dim", self.embedding_dim)
        return dim

    def _encode(self, emb_layer, batch, train):
        emb_list = []
        ctx = {k: v for k, v in batch.items()
               if k in self.feature_map.features}
        if ctx:
            out = emb_layer(ctx, flatten_emb=True)
            emb_list.append(out)
        item_dim = self._item_info_dim()
        # if the loader deduped the item rows, the items dict carries an
        # INVERSE_KEY and embedding_dict expands through the fused
        # single-scatter VJP (ops/embedding.py:table_gather_expand)
        item_emb = emb_layer(batch[ITEMS_KEY], flatten_emb=True)
        B = batch[SEQ_MASK_KEY].shape[0]
        item_emb = item_emb.reshape(B, -1, item_dim)
        mask = jnp.asarray(batch[SEQ_MASK_KEY])
        return emb_list, item_emb, mask

    def _raw_item_ids(self, batch, name):
        """Raw encoded values of an item-side field as [B, L+1] (undoes the
        loader's dedup via INVERSE_KEY when present)."""
        from fuxictr_tpu.ops.embedding import INVERSE_KEY
        vals = jnp.asarray(batch[ITEMS_KEY][name])
        if INVERSE_KEY in batch[ITEMS_KEY]:
            vals = vals[jnp.asarray(batch[ITEMS_KEY][INVERSE_KEY])]
        B = batch[SEQ_MASK_KEY].shape[0]
        return vals.reshape(B, -1)

    def _product_pool_feats(self, batch, target_emb, sel_emb, sel_mask,
                            mask, match_field, count_field):
        """Masked mean/max pooling of the elementwise target∘selected
        products over the model's retrieved set, plus log1p match-count
        scalars (exact ``match_field`` and ``count_field`` matches over the
        FULL history). Opt-in extension shared by the whole LongCTR family:
        attention-weighted sums followed by an MLP never learn
        target-history product structure on the planted window-exclusive
        benchmark, while pooled products make the affinity linearly
        readable (BENCHMARKS.md, LongCTR v3 — +0.105 AUC for SIM)."""
        pm = sel_mask[..., None]
        prod = target_emb[:, None, :] * sel_emb
        n_sel = jnp.maximum(sel_mask.sum(-1, keepdims=True), 1.0)
        prod_mean = (prod * pm).sum(1) / n_sel
        prod_max = jnp.where(
            sel_mask.sum(-1, keepdims=True) > 0,
            jnp.max(jnp.where(pm > 0, prod, _NEG_INF), axis=1), 0.0)
        feats = [prod_mean, prod_max]
        if match_field in batch[ITEMS_KEY]:
            tgt_ids = self._raw_item_ids(batch, match_field)
            exact = ((tgt_ids[:, :-1] == tgt_ids[:, -1:])
                     .astype(jnp.float32) * mask)
            feats.append(jnp.log1p(exact.sum(-1, keepdims=True)))
        if count_field and count_field != match_field \
                and count_field in batch[ITEMS_KEY]:
            f_ids = self._raw_item_ids(batch, count_field)
            fmatch = ((f_ids[:, :-1] == f_ids[:, -1:])
                      .astype(jnp.float32) * mask)
            feats.append(jnp.log1p(fmatch.sum(-1, keepdims=True)))
        return feats


def topk_gather(seq_emb, mask, scores, k):
    """Select top-k positions by score: ([B,k,D], [B,k]) via lax.top_k."""
    k = min(k, scores.shape[1])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    emb = jnp.take_along_axis(seq_emb, top_idx[..., None], axis=1)
    m = jnp.take_along_axis(mask, top_idx, axis=1)
    return emb, m, top_idx, top_scores


def lsh_hash(vecs, rotations):
    """Sign hash after random rotation → {0,1} codes (ETA.py:246-262)."""
    rotated = jnp.einsum("bld,dh->blh", vecs, rotations)
    return (rotated > 0).astype(jnp.float32)


# -------------------------------------------------------------------- SIM
class _SIMNet(_LongCTRBase):
    """SIM soft-search (ref: model_zoo/LongCTR/SIM/SIM.py:26-246): GSU
    qk-scores → top-k → ESU attention; auxiliary GSU head trained jointly.

    Extensions beyond the reference (both opt-in, defaults keep exact
    reference semantics; the reference asserts soft-only at SIM.py:87):

    - ``gsu_type="hard"`` — the SIM paper's hard search: the GSU keeps
      only history events whose ``gsu_hard_field`` (category) equals the
      target's, ranked within the matches by the soft qk score.
    - ``product_pooling=True`` — appends masked mean/max pooling of the
      elementwise target∘history products over the retrieved set plus
      log1p match-count scalars (exact-item and hard-field matches over
      the FULL sequence) to the ESU MLP input. Pooled products make
      target-history affinity LINEARLY readable — measured on the planted
      long-range benchmark, soft attention alone never learns it
      (BENCHMARKS.md, LongCTR v3)."""

    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_dropout: float = 0.0
    attention_dim: int = 64
    num_heads: int = 1
    short_seq_len: int = 50
    topk: int = 50
    alpha: float = 1.0
    beta: float = 1.0
    net_dropout: float = 0.0
    batch_norm: bool = False
    gsu_type: str = "soft"
    gsu_hard_field: str = "cate_id"
    product_pooling: bool = False
    match_field: str = "item_id"

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        # reference window semantics (SIM.py:143-146, same in ETA/SDIM/TWIN/
        # MIRRN): short_seq_len-1 items, and the mask slice sits one item
        # earlier than the emb slice — that off-by-one is a reference quirk
        # replicated verbatim for parity
        short_seq = item_emb[:, -self.short_seq_len:-1, :]
        short_mask = mask[:, -self.short_seq_len:-1]
        short_interest = MultiHeadTargetAttention(
            input_dim=target_emb.shape[-1], attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="short_attention")(target_emb, short_seq, short_mask,
                                    train=train)
        long_seq = item_emb[:, :-1, :]
        q = _dense(self.attention_dim, "W_a", use_bias=False)(target_emb)
        kk = _dense(self.attention_dim, "W_b", use_bias=False)(long_seq)
        qk = jnp.einsum("bd,bld->bl", q, kk) * mask
        pooled = jnp.einsum("bl,bld->bd", qk, long_seq)
        aux_in = jnp.concatenate(emb_list + [target_emb, pooled], axis=-1)
        y_aux = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                          hidden_activations=self.dnn_activations,
                          output_dim=1, dropout_rates=self.net_dropout,
                          batch_norm=self.batch_norm,
                          name="dnn_aux")(aux_in, train=train)
        # reference selects on qk AFTER the mask multiply (SIM.py:152-158):
        # padded positions carry score 0, NOT -inf, and can outrank
        # negative real scores — replicated verbatim for parity
        if self.gsu_type == "hard":
            hard_ids = self._raw_item_ids(batch, self.gsu_hard_field)
            hard_match = ((hard_ids[:, :-1] == hard_ids[:, -1:])
                          .astype(jnp.float32) * mask)
            sel = hard_match * 1e3 + jnp.tanh(qk)
        else:
            hard_match = None
            sel = qk
        topk_emb, topk_mask, top_idx, _ = topk_gather(long_seq, mask, sel,
                                                      self.topk)
        if hard_match is not None:
            topk_mask = topk_mask * jnp.take_along_axis(hard_match, top_idx,
                                                        axis=1)
        long_interest = MultiHeadTargetAttention(
            input_dim=target_emb.shape[-1], attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="long_attention")(target_emb, topk_emb, topk_mask,
                                   train=train)
        if hard_match is not None:
            # empty retrieval set => zero interest vector (all-masked
            # softmax would otherwise average arbitrary non-matches)
            any_match = (topk_mask.sum(-1, keepdims=True) > 0)
            long_interest = long_interest * any_match
        esu_feats = emb_list + [target_emb, short_interest, long_interest]
        if self.product_pooling:
            esu_feats += self._product_pool_feats(
                batch, target_emb, topk_emb, topk_mask, mask,
                self.match_field, self.gsu_hard_field)
        esu_in = jnp.concatenate(esu_feats, axis=-1)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm,
                      name="dnn")(esu_in, train=train)
        return {"y_pred": y, "y_aux": y_aux}


@register_model
class SIM(RankModel):
    """SIM (ref: model_zoo/LongCTR/SIM/SIM.py:26-246)."""

    _longctr = True

    def __init__(self, feature_map, model_id="SIM", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", attention_dropout=0.0,
                 attention_dim=64, num_heads=1, gsu_type="soft",
                 short_seq_len=50, topk=50, alpha=1, beta=1, net_dropout=0.0,
                 batch_norm=False, accumulation_steps=1,
                 gsu_hard_field="cate_id", product_pooling=False,
                 match_field="item_id", **kwargs):
        assert gsu_type in ("soft", "hard"), \
            f"gsu_type={gsu_type} not supported (soft|hard)."
        net = _SIMNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                      dnn_activations, attention_dropout, attention_dim,
                      num_heads, short_seq_len, topk, float(alpha),
                      float(beta), net_dropout, batch_norm,
                      gsu_type=gsu_type, gsu_hard_field=gsu_hard_field,
                      product_pooling=bool(product_pooling),
                      match_field=match_field)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self._alpha, self._beta = float(alpha), float(beta)
        self.compile(lr=learning_rate)

    def add_loss(self, outputs, y_true, weights):
        """GSU + ESU joint loss (ref SIM.py:170-195)."""
        from fuxictr_tpu.models.base import make_loss_fn
        loss_fn = make_loss_fn(self._loss_name)
        w = weights.reshape(-1, 1)
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        loss_esu = jnp.sum(loss_fn(outputs["y_pred"], y_true) * w) / wsum
        loss_gsu = jnp.sum(loss_fn(outputs["y_aux"], y_true) * w) / wsum
        return self._alpha * loss_gsu + self._beta * loss_esu


# -------------------------------------------------------------------- ETA
class _ETANet(_LongCTRBase):
    """ETA (ref: model_zoo/LongCTR/ETA/ETA.py): SimHash LSH retrieval —
    top-k by Hamming similarity to the target hash."""

    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_dropout: float = 0.0
    attention_dim: int = 64
    num_heads: int = 1
    short_seq_len: int = 50
    topk: int = 50
    hash_bits: int = 32
    net_dropout: float = 0.0
    batch_norm: bool = False
    product_pooling: bool = False
    match_field: str = "item_id"
    count_field: str = "cate_id"

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        # reference window semantics (SIM.py:143-146, same in ETA/SDIM/TWIN/
        # MIRRN): short_seq_len-1 items, and the mask slice sits one item
        # earlier than the emb slice — that off-by-one is a reference quirk
        # replicated verbatim for parity
        short_seq = item_emb[:, -self.short_seq_len:-1, :]
        short_mask = mask[:, -self.short_seq_len:-1]
        short_interest = MultiHeadTargetAttention(
            input_dim=target_emb.shape[-1], attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="short_attention")(target_emb, short_seq, short_mask,
                                    train=train)
        long_seq = item_emb[:, :-1, :]
        rotations = self.param(
            "random_rotations", jax.nn.initializers.normal(1.0),
            (target_emb.shape[-1], self.hash_bits))
        rotations = jax.lax.stop_gradient(rotations)
        seq_hash = lsh_hash(long_seq, rotations)
        tgt_hash = lsh_hash(target_emb[:, None, :], rotations)
        ham_dist = jnp.sum(jnp.abs(seq_hash - tgt_hash), axis=-1)
        # retrieve smallest distance → top_k on negative distance
        score = jnp.where(mask > 0, -ham_dist,
                          -(1.0 + self.hash_bits))
        topk_emb, topk_mask, _, _ = topk_gather(long_seq, mask, score,
                                                self.topk)
        long_interest = MultiHeadTargetAttention(
            input_dim=target_emb.shape[-1], attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="long_attention")(target_emb, topk_emb, topk_mask,
                                   train=train)
        feats = emb_list + [target_emb, short_interest, long_interest]
        if self.product_pooling:
            feats += self._product_pool_feats(
                batch, target_emb, topk_emb, topk_mask, mask,
                self.match_field, self.count_field)
        x = jnp.concatenate(feats, axis=-1)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm, name="dnn")(x, train=train)
        return {"y_pred": y}


@register_model
class ETA(RankModel):
    """ETA (ref: model_zoo/LongCTR/ETA/ETA.py)."""

    _longctr = True

    def __init__(self, feature_map, model_id="ETA", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", attention_dropout=0.0,
                 attention_dim=64, num_heads=1, short_seq_len=50, topk=50,
                 hash_bits=32, reuse_hash=True, net_dropout=0.0,
                 batch_norm=False, accumulation_steps=1,
                 product_pooling=False, match_field="item_id",
                 count_field="cate_id", **kwargs):
        net = _ETANet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                      dnn_activations, attention_dropout, attention_dim,
                      num_heads, short_seq_len, topk, hash_bits, net_dropout,
                      batch_norm, product_pooling=bool(product_pooling),
                      match_field=match_field, count_field=count_field)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- SDIM
class _SDIMNet(_LongCTRBase):
    """SDIM (ref: model_zoo/LongCTR/SDIM/SDIM.py): multi-round LSH — sum
    history items colliding with the target bucket. The reference's
    embedding_bag over dynamic nonzero indices becomes one dense
    [H,B,L]x[B,L,D] contraction (static shapes)."""

    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_dropout: float = 0.0
    attention_dim: int = 64
    num_heads: int = 1
    short_seq_len: int = 50
    num_hashes: int = 1
    hash_bits: int = 4
    l2_norm: bool = False      # reference default (SDIM.py:73)
    net_dropout: float = 0.0
    batch_norm: bool = False
    product_pooling: bool = False
    match_field: str = "item_id"
    count_field: str = "cate_id"

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        # reference window semantics (SIM.py:143-146, same in ETA/SDIM/TWIN/
        # MIRRN): short_seq_len-1 items, and the mask slice sits one item
        # earlier than the emb slice — that off-by-one is a reference quirk
        # replicated verbatim for parity
        short_seq = item_emb[:, -self.short_seq_len:-1, :]
        short_mask = mask[:, -self.short_seq_len:-1]
        short_interest = MultiHeadTargetAttention(
            input_dim=target_emb.shape[-1], attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="short_attention")(target_emb, short_seq, short_mask,
                                    train=train)
        long_seq = item_emb[:, :-1, :]
        rotations = jax.lax.stop_gradient(self.param(
            "random_rotations", jax.nn.initializers.normal(1.0),
            (target_emb.shape[-1], self.num_hashes, self.hash_bits)))
        # bucket codes: [B, L, H, bits] → collision per hash round
        seq_rot = jnp.einsum("bld,dhk->blhk", long_seq, rotations) > 0
        tgt_rot = jnp.einsum("bd,dhk->bhk", target_emb, rotations) > 0
        collide = jnp.all(seq_rot == tgt_rot[:, None], axis=-1)  # [B, L, H]
        collide = collide.astype(long_seq.dtype) * mask[..., None]
        attn = jnp.einsum("blh,bld->bhd", collide, long_seq)     # [B, H, D]
        if self.l2_norm:
            # rsqrt(sq + eps) instead of /norm: jnp.linalg.norm has a NaN
            # gradient at the zero vector, which padded rows and
            # no-collision rows hit (F.normalize parity within eps)
            sq = jnp.sum(attn * attn, axis=-1, keepdims=True)
            attn = attn * jax.lax.rsqrt(sq + 1e-12)
        long_interest = jnp.mean(attn, axis=1)
        feats = emb_list + [target_emb, long_interest, short_interest]
        if self.product_pooling:
            # retrieved set = events colliding with the target in ANY round
            sel_mask = jnp.max(collide, axis=-1)
            feats += self._product_pool_feats(
                batch, target_emb, long_seq, sel_mask, mask,
                self.match_field, self.count_field)
        x = jnp.concatenate(feats, axis=-1)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm, name="dnn")(x, train=train)
        return {"y_pred": y}


@register_model
class SDIM(RankModel):
    """SDIM (ref: model_zoo/LongCTR/SDIM/SDIM.py)."""

    _longctr = True

    def __init__(self, feature_map, model_id="SDIM", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", attention_dropout=0.0,
                 attention_dim=64, num_heads=1, short_seq_len=50,
                 num_hashes=1, hash_bits=4, l2_norm=False, reuse_hash=True,
                 net_dropout=0.0, batch_norm=False, accumulation_steps=1,
                 product_pooling=False, match_field="item_id",
                 count_field="cate_id", **kwargs):
        net = _SDIMNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                       dnn_activations, attention_dropout, attention_dim,
                       num_heads, short_seq_len, num_hashes, hash_bits,
                       l2_norm, net_dropout, batch_norm,
                       product_pooling=bool(product_pooling),
                       match_field=match_field, count_field=count_field)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- TWIN
class _TWINNet(_LongCTRBase):
    """TWIN (ref: model_zoo/LongCTR/TWIN/TWIN.py): consistent two-stage —
    the retrieval scores ARE the attention scores; top-k before softmax,
    with an optional cross-feature bias term."""

    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_dropout: float = 0.0
    attention_dim: int = 64
    num_heads: int = 1
    short_seq_len: int = 50
    topk: int = 50
    Kc_cross_features: int = 0
    net_dropout: float = 0.0
    batch_norm: bool = False
    product_pooling: bool = False
    match_field: str = "item_id"
    count_field: str = "cate_id"

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        target_emb = item_emb[:, -1, :]
        # reference window semantics (SIM.py:143-146, same in ETA/SDIM/TWIN/
        # MIRRN): short_seq_len-1 items, and the mask slice sits one item
        # earlier than the emb slice — that off-by-one is a reference quirk
        # replicated verbatim for parity
        short_seq = item_emb[:, -self.short_seq_len:-1, :]
        short_mask = mask[:, -self.short_seq_len:-1]
        short_interest = MultiHeadTargetAttention(
            input_dim=target_emb.shape[-1], attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="short_attention")(target_emb, short_seq, short_mask,
                                    train=train)
        long_seq = item_emb[:, :-1, :]
        B, L, item_dim = long_seq.shape
        H = self.num_heads
        head_dim = self.attention_dim // H
        Kc_dim = self.Kc_cross_features * self.embedding_dim
        Kh_dim = item_dim - Kc_dim
        item_feat_seq = long_seq[..., :Kh_dim]
        q = _dense(self.attention_dim, "W_q", use_bias=False)(
            target_emb[..., :Kh_dim])
        k = _dense(self.attention_dim, "W_h", use_bias=False)(item_feat_seq)
        v = _dense(self.attention_dim, "W_v", use_bias=False)(long_seq)
        qh = q.reshape(B, H, 1, head_dim)
        kh = k.reshape(B, L, H, head_dim).transpose(0, 2, 1, 3)
        vh = v.reshape(B, L, H, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhld->bhql", qh, kh)[:, :, 0, :] \
            / head_dim ** 0.5                                    # [B, H, L]
        if self.Kc_cross_features > 0:
            cross_seq = long_seq[..., Kh_dim:].reshape(
                B, L, self.Kc_cross_features, self.embedding_dim)
            W_c = self.param("W_c", xavier_normal(),
                             (H, self.Kc_cross_features, self.embedding_dim))
            key_c = jnp.einsum("blkd,hkd->blhk", cross_seq, W_c)
            bias = _dense(1, "beta", use_bias=False)(key_c)[..., 0]  # [B,L,H]
            scores = scores + bias.transpose(0, 2, 1)
        scores = jnp.where(mask[:, None, :] > 0, scores, _NEG_INF)
        k_sel = min(self.topk, L)
        top_scores, top_idx = jax.lax.top_k(scores, k_sel)       # [B, H, k]
        top_v = jnp.take_along_axis(vh, top_idx[..., None], axis=2)
        attn = jax.nn.softmax(top_scores, axis=-1)
        if self.attention_dropout > 0:
            attn = nn.Dropout(self.attention_dropout,
                              deterministic=not train)(attn)
        out = jnp.einsum("bhk,bhkd->bhd", attn, top_v).reshape(
            B, self.attention_dim)
        long_interest = _dense(item_dim, "W_o", use_bias=False)(out)
        feats = emb_list + [target_emb, short_interest, long_interest]
        if self.product_pooling:
            # pool in ITEM space: select top-k by the head-averaged
            # consistent retrieval score
            sel_emb, sel_mask, _, _ = topk_gather(
                long_seq, mask, jnp.mean(scores, axis=1), self.topk)
            feats += self._product_pool_feats(
                batch, target_emb, sel_emb, sel_mask, mask,
                self.match_field, self.count_field)
        x = jnp.concatenate(feats, axis=-1)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm, name="dnn")(x, train=train)
        return {"y_pred": y}


@register_model
class TWIN(RankModel):
    """TWIN (ref: model_zoo/LongCTR/TWIN/TWIN.py)."""

    _longctr = True

    def __init__(self, feature_map, model_id="TWIN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", attention_dropout=0.0,
                 attention_dim=64, num_heads=1, short_seq_len=50, topk=50,
                 Kc_cross_features=0, net_dropout=0.0, batch_norm=False,
                 accumulation_steps=1, product_pooling=False,
                 match_field="item_id", count_field="cate_id", **kwargs):
        net = _TWINNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                       dnn_activations, attention_dropout, attention_dim,
                       num_heads, short_seq_len, topk, Kc_cross_features,
                       net_dropout, batch_norm,
                       product_pooling=bool(product_pooling),
                       match_field=match_field, count_field=count_field)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------ MIRRN
class _MIRRNNet(_LongCTRBase):
    """MIRRN (ref: model_zoo/LongCTR/MIRRN/MIRRN.py:33-390): three LSH
    retrievals (target/short-mean/global-mean queries), positional offsets,
    block frequency-domain filter layers, fused by target attention."""

    dnn_hidden_units: Sequence[int] = (512, 128, 64)
    dnn_activations: Union[str, Sequence[str]] = "relu"
    attention_dim: int = 64
    num_heads: int = 1
    attention_dropout: float = 0.0
    hash_bits: int = 32
    topk: int = 50
    max_len: int = 1000
    short_seq_len: int = 50
    n_block: int = 4      # the reference hardcodes 4 (MIRRN.py:112-114)
    net_dropout: float = 0.0
    batch_norm: bool = False
    product_pooling: bool = False
    match_field: str = "item_id"
    count_field: str = "cate_id"

    def _filter_layer(self, x, idx, train):
        """Frequency-domain block filter (MIRRN.py:328-368). Matches the
        reference's effective computation (its einsum takes diag(B))."""
        B_, L_, D_ = x.shape
        nb = self.n_block
        w = self.param(f"complex_weight_{idx}",
                       jax.nn.initializers.normal(0.02),
                       (nb, D_ // nb, 2))
        A = jnp.fft.rfft(x, axis=1, norm="ortho")
        A = A.reshape(B_, -1, nb, D_ // nb)
        Bc = w[..., 0] + 1j * w[..., 1]
        C = A * Bc[None, None]
        C = C.reshape(B_, -1, D_)
        out = jnp.fft.irfft(C, n=L_, axis=1, norm="ortho")
        # the reference hardcodes 0.1 filter dropout (MIRRN.py:112-114)
        out = nn.Dropout(0.1, deterministic=not train)(out)
        return nn.LayerNorm(epsilon=1e-12,
                            name=f"filter_ln_{idx}")(out + x)

    @nn.compact
    def __call__(self, batch, train=False):
        emb_layer = FeatureEmbedding(self.feature_map, self.embedding_dim,
                                     name="embedding")
        emb_list, item_emb, mask = self._encode(emb_layer, batch, train)
        item_dim = item_emb.shape[-1]
        target_emb = item_emb[:, -1, :]
        # reference window semantics (SIM.py:143-146, same in ETA/SDIM/TWIN/
        # MIRRN): short_seq_len-1 items, and the mask slice sits one item
        # earlier than the emb slice — that off-by-one is a reference quirk
        # replicated verbatim for parity
        short_seq = item_emb[:, -self.short_seq_len:-1, :]
        short_mask = mask[:, -self.short_seq_len:-1]
        short_interest = MultiHeadTargetAttention(
            input_dim=item_dim, attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="short_attention")(target_emb, short_seq, short_mask,
                                    train=train)
        seq = item_emb[:, :-1, :]
        L = seq.shape[1]
        rotations = jax.lax.stop_gradient(self.param(
            "random_rotations", jax.nn.initializers.normal(1.0),
            (item_dim, self.hash_bits)))
        pos_table = self.param("pos_emb", jax.nn.initializers.normal(1e-2),
                               (self.max_len + 1, item_dim))

        def retrieve(query):
            seq_hash = lsh_hash(seq, rotations)
            q_hash = lsh_hash(query[:, None, :], rotations)
            dist = jnp.sum(jnp.abs(seq_hash - q_hash), axis=-1)
            score = jnp.where(mask > 0, -dist, -(1.0 + self.hash_bits))
            k = min(self.topk, score.shape[1])
            # the reference re-sorts selected indices ascending before the
            # FFT filter (MIRRN.py:240) — position order matters there
            idx = jnp.sort(jax.lax.top_k(score, k)[1], axis=-1)
            emb = jnp.take_along_axis(seq, idx[..., None], axis=1)
            pos = jnp.take(pos_table, jnp.minimum(L - idx, self.max_len),
                           axis=0)
            return emb + 0.02 * pos, idx

        def masked_mean(x, m):
            m = m[..., None]
            return jnp.sum(x * m, axis=1) / jnp.maximum(m.sum(axis=1), 1e-9)

        views = [
            retrieve(target_emb),
            retrieve(masked_mean(seq[:, -16:], mask[:, -16:])),
            retrieve(masked_mean(seq, mask)),
        ]
        interests = [self._filter_layer(v, i, train).mean(axis=1)
                     for i, (v, _) in enumerate(views)]
        interest_emb = jnp.stack(interests, axis=1)              # [B, 3, D]
        long_interest = MultiHeadTargetAttention(
            input_dim=item_dim, attention_dim=self.attention_dim,
            num_heads=self.num_heads, dropout_rate=self.attention_dropout,
            name="long_attention")(target_emb, interest_emb, None,
                                   train=train)
        feats = emb_list + [target_emb, short_interest, long_interest]
        if self.product_pooling:
            # pool over the target-query retrieved set (raw embeddings,
            # no positional offsets)
            tgt_idx = views[0][1]
            sel_emb = jnp.take_along_axis(seq, tgt_idx[..., None], axis=1)
            sel_mask = jnp.take_along_axis(mask, tgt_idx, axis=1)
            feats += self._product_pool_feats(
                batch, target_emb, sel_emb, sel_mask, mask,
                self.match_field, self.count_field)
        x = jnp.concatenate(feats, axis=-1)
        y = MLP_Block(hidden_units=tuple(self.dnn_hidden_units),
                      hidden_activations=self.dnn_activations,
                      output_dim=1, dropout_rates=self.net_dropout,
                      batch_norm=self.batch_norm, name="dnn")(x, train=train)
        return {"y_pred": y}


@register_model
class MIRRN(RankModel):
    """MIRRN (ref: model_zoo/LongCTR/MIRRN/MIRRN.py:33-390)."""

    _longctr = True

    def __init__(self, feature_map, model_id="MIRRN", learning_rate=1e-3,
                 embedding_dim=10, dnn_hidden_units=(512, 128, 64),
                 dnn_activations="relu", attention_dim=64, num_heads=1,
                 use_scale=True, attention_dropout=0.0, reuse_hash=True,
                 hash_bits=32, topk=50, max_len=1000, short_seq_len=50,
                 net_dropout=0.0, batch_norm=False, accumulation_steps=1,
                 product_pooling=False, match_field="item_id",
                 count_field="cate_id", **kwargs):
        net = _MIRRNNet(feature_map, embedding_dim, tuple(dnn_hidden_units),
                        dnn_activations, attention_dim, num_heads,
                        attention_dropout, hash_bits, topk, max_len,
                        short_seq_len, 4, net_dropout, batch_norm,
                        product_pooling=bool(product_pooling),
                        match_field=match_field, count_field=count_field)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
