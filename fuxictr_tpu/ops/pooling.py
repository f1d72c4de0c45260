"""Masked sequence pooling ops.

Masks are derived from the id tensor (padding id 0), not from zero embedding
vectors as in the reference (/root/reference/fuxictr/pytorch/layers/pooling.py:23-107)
— id-based masks are exact and cheaper on TPU (no reduction over the
embedding dim to infer the mask).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


def masked_average_pool(emb, mask):
    """emb [B, L, D], mask [B, L] → [B, D] mean over valid positions."""
    mask = mask.astype(emb.dtype)
    summed = jnp.einsum("bld,bl->bd", emb, mask)
    counts = jnp.maximum(mask.sum(axis=1, keepdims=True), 1e-16)
    return summed / counts


def masked_sum_pool(emb, mask):
    """emb [B, L, D], mask [B, L] → [B, D] sum over valid positions."""
    return jnp.einsum("bld,bl->bd", emb, mask.astype(emb.dtype))


class MaskedAveragePooling(nn.Module):
    def __call__(self, emb, mask=None):
        if mask is None:  # fall back to inferring mask from non-zero vectors
            mask = jnp.any(emb != 0, axis=-1)
        return masked_average_pool(emb, mask)


class MaskedSumPooling(nn.Module):
    def __call__(self, emb, mask=None):
        if mask is None:
            mask = jnp.any(emb != 0, axis=-1)
        return masked_sum_pool(emb, mask)


class KMaxPooling(nn.Module):
    """Top-k values along an axis, keeping their ORIGINAL order (reference
    pooling.py:76-107: topk indices re-sorted by position, then gathered)."""

    k: int = 1
    axis: int = -1

    def __call__(self, x):
        axis = self.axis % x.ndim
        moved = jnp.moveaxis(x, axis, -1)
        _, idx = jax.lax.top_k(moved, self.k)
        idx = jnp.sort(idx, axis=-1)            # restore positional order
        top = jnp.take_along_axis(moved, idx, axis=-1)
        return jnp.moveaxis(top, -1, axis)
