"""Attention ops.

Parity targets: /root/reference/fuxictr/pytorch/layers/attentions/*.py and
AutoInt's MultiHeadSelfAttention (model_zoo/AutoInt/src/AutoInt.py:122-190).
All attention math is batched einsum on [B, H, L, Dh] so it tiles onto the
MXU; masks add −1e9 pre-softmax like the reference.
"""

from typing import Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.ops.common import xavier_normal, zeros_init
from fuxictr_tpu.ops.mlp import MLP_Block

_NEG_INF = -1.0e9


def scaled_dot_product_attention(q, k, v, scale=None, mask=None,
                                 dropout_rate=0.0, deterministic=True,
                                 dropout_rng=None):
    """q [.., Lq, D], k/v [.., Lk, D]; mask broadcastable to [.., Lq, Lk]."""
    scores = jnp.einsum("...qd,...kd->...qk", q, k)
    if scale:
        scores = scores / scale
    if mask is not None:
        scores = jnp.where(mask.astype(bool), scores, _NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep / (1.0 - dropout_rate)
    out = jnp.einsum("...qk,...kd->...qd", attn, v)
    return out, attn


class ScaledDotProductAttention(nn.Module):
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, q, k, v, scale=None, mask=None, train=False):
        rng = self.make_rng("dropout") if (train and self.dropout_rate > 0) else None
        return scaled_dot_product_attention(
            q, k, v, scale=scale, mask=mask, dropout_rate=self.dropout_rate,
            deterministic=not train, dropout_rng=rng)


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, l, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * dh)


class MultiHeadSelfAttention(nn.Module):
    """AutoInt-style interacting layer: QKV proj → attention → residual →
    optional LayerNorm → ReLU."""

    input_dim: int
    attention_dim: int = None
    num_heads: int = 1
    dropout_rate: float = 0.0
    use_residual: bool = True
    use_scale: bool = False
    layer_norm: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        att_dim = self.attention_dim or self.input_dim
        head_dim = att_dim // self.num_heads
        dense = lambda name: nn.Dense(att_dim, use_bias=False,
                                      kernel_init=xavier_normal(), name=name)
        q = _split_heads(dense("W_q")(x), self.num_heads)
        k = _split_heads(dense("W_k")(x), self.num_heads)
        v = _split_heads(dense("W_v")(x), self.num_heads)
        scale = head_dim ** 0.5 if self.use_scale else None
        out, _ = ScaledDotProductAttention(self.dropout_rate)(
            q, k, v, scale=scale, train=train)
        out = _merge_heads(out)
        if self.use_residual:
            res = x
            if self.input_dim != att_dim:
                res = nn.Dense(att_dim, use_bias=False,
                               kernel_init=xavier_normal(), name="W_res")(x)
            out = out + res
        if self.layer_norm:
            out = nn.LayerNorm(epsilon=1e-5)(out)  # torch nn.LayerNorm eps
        return jax.nn.relu(out)


class MultiHeadTargetAttention(nn.Module):
    """Single-query multi-head attention of a target item over history."""

    input_dim: int = 64
    attention_dim: int = 64
    num_heads: int = 1
    dropout_rate: float = 0.0
    use_scale: bool = True
    use_qkvo: bool = True

    @nn.compact
    def __call__(self, target_item, history_sequence, mask=None, train=False):
        att_dim = self.attention_dim if self.use_qkvo else self.input_dim
        head_dim = att_dim // self.num_heads
        if self.use_qkvo:
            dense = lambda name: nn.Dense(att_dim, use_bias=False,
                                          kernel_init=xavier_normal(), name=name)
            q = dense("W_q")(target_item)
            k = dense("W_k")(history_sequence)
            v = dense("W_v")(history_sequence)
        else:
            q, k, v = target_item, history_sequence, history_sequence
        q = _split_heads(q[:, None, :], self.num_heads)      # [B, H, 1, Dh]
        k = _split_heads(k, self.num_heads)
        v = _split_heads(v, self.num_heads)
        if mask is not None:
            mask = mask[:, None, None, :]                    # [B, 1, 1, L]
        scale = head_dim ** 0.5 if self.use_scale else None
        out, _ = ScaledDotProductAttention(self.dropout_rate)(
            q, k, v, scale=scale, mask=mask, train=train)
        out = _merge_heads(out)[:, 0, :]                     # [B, att_dim]
        if self.use_qkvo:
            out = nn.Dense(self.input_dim, use_bias=False,
                           kernel_init=xavier_normal(), name="W_o")(out)
        return out


class DINAttention(nn.Module):
    """DIN MLP attention over [t, h, t−h, t∘h] with optional masked softmax."""

    embedding_dim: int = 64
    attention_units: Sequence[int] = (32,)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    output_activation: str = None
    dropout_rate: float = 0.0
    batch_norm: bool = False
    use_softmax: bool = False

    @nn.compact
    def __call__(self, target_item, history_sequence, mask=None, train=False):
        seq_len = history_sequence.shape[1]
        target = jnp.broadcast_to(target_item[:, None, :],
                                  history_sequence.shape)
        att_in = jnp.concatenate(
            [target, history_sequence, target - history_sequence,
             target * history_sequence], axis=-1)            # [B, L, 4D]
        weight = MLP_Block(
            hidden_units=tuple(self.attention_units),
            hidden_activations=self.hidden_activations,
            output_dim=1, output_activation=self.output_activation,
            dropout_rates=self.dropout_rate, batch_norm=self.batch_norm,
            name="attention_mlp")(att_in, train=train)[..., 0]  # [B, L]
        if mask is not None:
            weight = weight * mask.astype(weight.dtype)
        if self.use_softmax:
            if mask is not None:
                weight = weight + _NEG_INF * (1.0 - mask.astype(weight.dtype))
            weight = jax.nn.softmax(weight, axis=-1)
        return jnp.einsum("bl,bld->bd", weight, history_sequence)


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer encoder block (BST/TransAct-style)."""

    model_dim: int
    num_heads: int = 2
    ff_dim: int = 64
    dropout_rate: float = 0.0
    use_ffn: bool = True
    ffn_activation: str = "relu"    # BST's reference FFN uses leaky_relu

    @nn.compact
    def __call__(self, x, mask=None, attn_mask=None, train=False):
        """``mask`` [B, L]: valid keys; ``attn_mask`` [B, Lq, Lk]: full
        allowed-position mask (overrides ``mask``; BST's diagonal-allowed /
        causal masks need the full form)."""
        head_dim = self.model_dim // self.num_heads
        dense = lambda n, d: nn.Dense(d, kernel_init=xavier_normal(),
                                      bias_init=zeros_init, name=n)
        q = _split_heads(dense("W_q", self.model_dim)(x), self.num_heads)
        k = _split_heads(dense("W_k", self.model_dim)(x), self.num_heads)
        v = _split_heads(dense("W_v", self.model_dim)(x), self.num_heads)
        att_mask = None
        if attn_mask is not None:
            att_mask = attn_mask[:, None, :, :]
        elif mask is not None:
            att_mask = mask[:, None, None, :]
        out, _ = ScaledDotProductAttention(self.dropout_rate)(
            q, k, v, scale=head_dim ** 0.5, mask=att_mask, train=train)
        out = dense("W_o", self.model_dim)(_merge_heads(out))
        if self.dropout_rate > 0:
            out = nn.Dropout(self.dropout_rate, deterministic=not train)(out)
        x = nn.LayerNorm(epsilon=1e-5)(x + out)
        if self.use_ffn:
            act = (jax.nn.leaky_relu if self.ffn_activation == "leaky_relu"
                   else jax.nn.relu)
            h = act(dense("ffn_1", self.ff_dim)(x))
            h = dense("ffn_2", self.model_dim)(h)
            if self.dropout_rate > 0:
                h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
            x = nn.LayerNorm(epsilon=1e-5)(x + h)
        return x


# reference export name (target_attention.py:26)
DIN_Attention = DINAttention
