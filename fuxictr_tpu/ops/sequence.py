"""Recurrent sequence ops as masked scans (TPU-native DIEN support).

The reference's DynamicGRU unrolls a Python loop over PackedSequence
batch_sizes (/root/reference/model_zoo/DIEN/src/DIEN.py:373-520) — the one
truly sequential host loop in the repo. Here every variant is a masked
``nn.scan`` over time with fixed [B, L, D] shapes: padded steps carry the
hidden state through unchanged, which reproduces the packed-loop semantics
(final state = state at each row's last valid step) without dynamic shapes.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.ops.common import xavier_normal, zeros_init


class _GRUStepCell(nn.Module):
    """One masked GRU step: carry [B, H], input ([B, D], [B])."""

    hidden_size: int

    @nn.compact
    def __call__(self, h, inputs):
        x_t, m_t = inputs
        gx = nn.Dense(3 * self.hidden_size, kernel_init=xavier_normal(),
                      bias_init=zeros_init, name="x2h")(x_t)
        gh = nn.Dense(3 * self.hidden_size, kernel_init=xavier_normal(),
                      bias_init=zeros_init, name="h2h")(h)
        i_u, i_r, i_n = jnp.split(gx, 3, axis=-1)
        h_u, h_r, h_n = jnp.split(gh, 3, axis=-1)
        u = jax.nn.sigmoid(i_u + h_u)
        r = jax.nn.sigmoid(i_r + h_r)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - u) * n + u * h
        m = m_t[:, None]
        h = jnp.where(m, h_new, h)
        out = jnp.where(m, h_new, jnp.zeros_like(h_new))
        return h, out


class MaskedGRU(nn.Module):
    """GRU over [B, L, D] with validity mask → (outputs [B, L, H], h [B, H]).

    Padded steps keep the previous state and emit zeros in ``outputs``.
    """

    hidden_size: int

    @nn.compact
    def __call__(self, seq, mask):
        scan = nn.scan(_GRUStepCell, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=((1, 1),), out_axes=1)
        h0 = jnp.zeros((seq.shape[0], self.hidden_size), seq.dtype)
        h_final, outs = scan(self.hidden_size, name="cell")(
            h0, (seq, mask.astype(bool)))
        return outs, h_final


class _AttnGRUStepCell(nn.Module):
    """One masked AGRU/AUGRU step (ref DIEN.py:373-450):

    AGRU : h' = h + a·(n − h)               (attention replaces update gate)
    AUGRU: h' = h + (a·σ(u))·(n − h)        (attention scales update gate)
    """

    hidden_size: int
    gru_type: str = "AUGRU"

    @nn.compact
    def __call__(self, h, inputs):
        x_t, a_t, m_t = inputs
        gx = nn.Dense(3 * self.hidden_size, kernel_init=xavier_normal(),
                      bias_init=zeros_init, name="x2h")(x_t)
        gh = nn.Dense(3 * self.hidden_size, kernel_init=xavier_normal(),
                      bias_init=zeros_init, name="h2h")(h)
        i_u, i_r, i_n = jnp.split(gx, 3, axis=-1)
        h_u, h_r, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        n = jnp.tanh(i_n + r * h_n)
        if self.gru_type == "AUGRU":
            gate = jax.nn.sigmoid(i_u + h_u) * a_t[:, None]
        else:  # AGRU
            gate = jnp.broadcast_to(a_t[:, None], h.shape)
        h_new = h + gate * (n - h)
        h = jnp.where(m_t[:, None], h_new, h)
        return h, None


class AttentionalGRU(nn.Module):
    """AGRU/AUGRU over [B, L, D] with attention scores → final state [B, H]."""

    hidden_size: int
    gru_type: str = "AUGRU"

    @nn.compact
    def __call__(self, seq, attn, mask):
        scan = nn.scan(_AttnGRUStepCell, variable_broadcast="params",
                       split_rngs={"params": False},
                       in_axes=((1, 1, 1),), out_axes=1)
        h0 = jnp.zeros((seq.shape[0], self.hidden_size), seq.dtype)
        h_final, _ = scan(self.hidden_size, self.gru_type, name="cell")(
            h0, (seq, attn, mask.astype(bool)))
        return h_final
