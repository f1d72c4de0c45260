"""Logistic regression and factorization machine building blocks.

Parity targets: /root/reference/fuxictr/pytorch/layers/blocks/
{logistic_regression,factorization_machine}.py. The LR weights are a dim-1
fused embedding table; FM's pairwise term uses the sum-square identity, one
fused [B, F, D] tensor in, scalar out — all MXU/VPU friendly dense algebra.
"""

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from fuxictr_tpu.ops.common import zeros_init
from fuxictr_tpu.ops.embedding import FeatureEmbedding


class LogisticRegression(nn.Module):
    feature_map: Any
    use_bias: bool = True

    @nn.compact
    def __call__(self, batch):
        # dim-1 embeddings as per-feature weights; sequences sum-pooled
        weights = FeatureEmbedding(
            self.feature_map, embedding_dim=1, force_dim=1,
            use_pretrain=False, use_sharing=False, pool_sequences="sum",
            name="embedding")(batch)          # [B, F, 1]
        logit = jnp.sum(weights, axis=(1, 2), keepdims=False)[:, None]
        if self.use_bias:
            bias = self.param("bias", zeros_init, (1,))
            logit = logit + bias
        return logit  # [B, 1]


def fm_pairwise_sum(feature_emb):
    """0.5 * [ (Σ_f v_f)² − Σ_f v_f² ] summed over dim → [B, 1]."""
    sum_of_emb = jnp.sum(feature_emb, axis=1)
    sq_of_sum = sum_of_emb * sum_of_emb
    sum_of_sq = jnp.sum(feature_emb * feature_emb, axis=1)
    return 0.5 * jnp.sum(sq_of_sum - sum_of_sq, axis=-1, keepdims=True)


class FactorizationMachine(nn.Module):
    """LR linear term + FM pairwise term over the fused embedding tensor."""

    feature_map: Any

    @nn.compact
    def __call__(self, batch, feature_emb):
        lr = LogisticRegression(self.feature_map, name="lr")(batch)
        return lr + fm_pairwise_sum(feature_emb)
