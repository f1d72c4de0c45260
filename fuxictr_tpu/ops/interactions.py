"""Feature-interaction ops.

Parity targets (semantics, not code): /root/reference/fuxictr/pytorch/layers/
interactions/*.py — InnerProductInteraction (4 output modes), CrossNet /
CrossNetV2 / CrossNetMix, CompressedInteractionNet (xDeepFM), Bilinear
interactions (FiBiNET), HolographicInteraction (HFM), InteractionMachine
(DeepIM), SqueezeExcitation (SENET). Everything is expressed as batched
dense algebra (einsum/matmul) so XLA maps it onto the MXU; pairwise index
selection uses precomputed static triu indices.
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from fuxictr_tpu.ops.common import Activation, xavier_normal, zeros_init


def _triu_pairs(num_fields, offset=1):
    p, q = np.triu_indices(num_fields, k=offset)
    return jnp.asarray(p), jnp.asarray(q)


class InnerProductInteraction(nn.Module):
    """FM-style inner products: product_sum | bi_interaction |
    inner_product (upper-triangular Gram entries) | elementwise_product."""

    num_fields: int
    output: str = "product_sum"

    @nn.compact
    def __call__(self, feature_emb):
        if self.output == "product_sum":
            sum_emb = jnp.sum(feature_emb, axis=1)
            bi = sum_emb * sum_emb - jnp.sum(feature_emb ** 2, axis=1)
            return 0.5 * jnp.sum(bi, axis=-1, keepdims=True)
        if self.output == "bi_interaction":
            sum_emb = jnp.sum(feature_emb, axis=1)
            return 0.5 * (sum_emb * sum_emb - jnp.sum(feature_emb ** 2, axis=1))
        if self.output == "inner_product":
            gram = jnp.einsum("bfd,bgd->bfg", feature_emb, feature_emb)
            p, q = _triu_pairs(self.num_fields)
            return gram[:, p, q]
        if self.output == "elementwise_product":
            p, q = _triu_pairs(self.num_fields)
            return feature_emb[:, p] * feature_emb[:, q]
        raise ValueError(f"output={self.output} is not supported.")


class CrossNet(nn.Module):
    """DCN rank-1 cross: x_{i+1} = x_i + (x_0 · w_iᵀ x_i + b_i)."""

    input_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x0):
        xi = x0
        for i in range(self.num_layers):
            w = self.param(f"w_{i}", xavier_normal(), (self.input_dim, 1))
            b = self.param(f"b_{i}", zeros_init, (self.input_dim,))
            xi = xi + (xi @ w) * x0 + b
        return xi


class CrossNetV2(nn.Module):
    """DCNv2 full-matrix cross: x_{i+1} = x_i + x_0 ∘ W_i x_i."""

    input_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x0):
        xi = x0
        for i in range(self.num_layers):
            dense = nn.Dense(self.input_dim, kernel_init=xavier_normal(),
                             bias_init=zeros_init, name=f"cross_{i}")
            xi = xi + x0 * dense(xi)
        return xi


class CrossNetMix(nn.Module):
    """DCN-M low-rank mixture-of-experts cross with tanh in rank space."""

    input_dim: int
    num_layers: int = 2
    low_rank: int = 32
    num_experts: int = 4

    @nn.compact
    def __call__(self, inputs):
        x0 = inputs                                         # [B, D]
        xl = x0
        for i in range(self.num_layers):
            U = self.param(f"U_{i}", xavier_normal(),
                           (self.num_experts, self.input_dim, self.low_rank))
            V = self.param(f"V_{i}", xavier_normal(),
                           (self.num_experts, self.input_dim, self.low_rank))
            C = self.param(f"C_{i}", xavier_normal(),
                           (self.num_experts, self.low_rank, self.low_rank))
            b = self.param(f"bias_{i}", zeros_init, (self.input_dim,))
            gates = nn.Dense(self.num_experts, use_bias=False,
                             kernel_init=xavier_normal(),
                             name=f"gate_{i}")(xl)           # [B, E]
            gates = jax.nn.softmax(gates, axis=-1)
            vx = jnp.tanh(jnp.einsum("bd,edr->ber", xl, V))
            vx = jnp.tanh(jnp.einsum("ber,erq->beq", vx, C))
            uvx = jnp.einsum("ber,edr->bed", vx, U) + b      # [B, E, D]
            expert_out = x0[:, None, :] * uvx
            xl = xl + jnp.einsum("bed,be->bd", expert_out, gates)
        return xl


class CompressedInteractionNet(nn.Module):
    """xDeepFM CIN: per-layer outer product + 1x1 conv compression + linear."""

    num_fields: int
    cin_hidden_units: Sequence[int]
    output_dim: int = 1

    @nn.compact
    def __call__(self, feature_emb):
        pooled = []
        x0 = feature_emb                                    # [B, F, D]
        xi = x0
        for i, units in enumerate(self.cin_hidden_units):
            # outer product over fields (x0-major flattening, matching the
            # reference einsum "bhd,bmd->bhmd" with X_0 first), compressed
            # by a [F*H -> units] conv1x1
            z = jnp.einsum("bhd,bfd->bhfd", x0, xi)
            z = z.reshape(z.shape[0], -1, z.shape[-1])       # [B, H*F, D]
            w = self.param(f"conv_{i}", xavier_normal(),
                           (z.shape[1], units))
            b = self.param(f"conv_bias_{i}", zeros_init, (units,))
            xi = jnp.einsum("bkd,ku->bud", z, w) + b[None, :, None]
            pooled.append(jnp.sum(xi, axis=-1))              # [B, units]
        concat = jnp.concatenate(pooled, axis=-1)
        return nn.Dense(self.output_dim, kernel_init=xavier_normal(),
                        bias_init=zeros_init, name="fc")(concat)


class BilinearInteraction(nn.Module):
    """FiBiNET bilinear: field_all | field_each | field_interaction,
    vectorised over static triu pairs (reference's V2 formulation)."""

    num_fields: int
    embedding_dim: int
    bilinear_type: str = "field_interaction"

    @nn.compact
    def __call__(self, feature_emb):
        d = self.embedding_dim
        p, q = _triu_pairs(self.num_fields)
        if self.bilinear_type == "field_all":
            W = self.param("W", xavier_normal(), (d, d))
            left = jnp.einsum("bfd,de->bfe", feature_emb, W)
            return left[:, p] * feature_emb[:, q]
        if self.bilinear_type == "field_each":
            W = self.param("W", xavier_normal(), (self.num_fields, d, d))
            left = jnp.einsum("bfd,fde->bfe", feature_emb, W)
            return left[:, p] * feature_emb[:, q]
        if self.bilinear_type == "field_interaction":
            npairs = len(p)
            W = self.param("W", xavier_normal(), (npairs, d, d))
            left = jnp.einsum("bpd,pde->bpe", feature_emb[:, p], W)
            return left * feature_emb[:, q]
        raise ValueError(f"bilinear_type={self.bilinear_type} not supported.")


class HolographicInteraction(nn.Module):
    """HFM pairwise interactions: hadamard | circular convolution |
    circular correlation (via rFFT, exact for real inputs)."""

    num_fields: int
    interaction_type: str = "circular_convolution"

    @nn.compact
    def __call__(self, feature_emb):
        p, q = _triu_pairs(self.num_fields)
        emb1, emb2 = feature_emb[:, p], feature_emb[:, q]
        if self.interaction_type == "hadamard_product":
            return emb1 * emb2
        f1 = jnp.fft.rfft(emb1, axis=-1)
        f2 = jnp.fft.rfft(emb2, axis=-1)
        n = emb1.shape[-1]
        if self.interaction_type == "circular_convolution":
            return jnp.fft.irfft(f1 * f2, n=n, axis=-1)
        if self.interaction_type == "circular_correlation":
            return jnp.fft.irfft(jnp.conj(f1) * f2, n=n, axis=-1)
        raise ValueError(
            f"interaction_type={self.interaction_type} not supported.")


class InteractionMachine(nn.Module):
    """DeepIM: order-2..5 interactions from power sums (Newton's identities)."""

    embedding_dim: int
    order: int = 2
    batch_norm: bool = False

    @nn.compact
    def __call__(self, feature_emb, train=False):
        assert 1 <= self.order <= 5, "order must be in [1, 5]"
        # power sums p_k = Σ_f v_f^k
        p = [jnp.sum(feature_emb ** k, axis=1) for k in range(1, self.order + 1)]
        outs = [p[0]]
        if self.order >= 2:
            outs.append((p[0] ** 2 - p[1]) / 2)
        if self.order >= 3:
            outs.append((p[0] ** 3 - 3 * p[0] * p[1] + 2 * p[2]) / 6)
        if self.order >= 4:
            outs.append((p[0] ** 4 - 6 * p[0] ** 2 * p[1] + 3 * p[1] ** 2
                         + 8 * p[0] * p[2] - 6 * p[3]) / 24)
        if self.order >= 5:
            outs.append((p[0] ** 5 - 10 * p[0] ** 3 * p[1]
                         + 20 * p[0] ** 2 * p[2] - 30 * p[0] * p[3]
                         - 20 * p[1] * p[2] + 15 * p[0] * p[1] ** 2
                         + 24 * p[4]) / 120)
        out = jnp.concatenate(outs, axis=-1)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9)(out)
        return nn.Dense(1, kernel_init=xavier_normal(), bias_init=zeros_init,
                        name="fc")(out)


class SqueezeExcitation(nn.Module):
    """FiBiNET SENET: mean-squeeze fields → bottleneck MLP → rescale."""

    num_fields: int
    reduction_ratio: int = 3
    excitation_activation: str = "relu"

    @nn.compact
    def __call__(self, feature_emb, train=False):
        reduced = max(1, self.num_fields // self.reduction_ratio)
        z = jnp.mean(feature_emb, axis=-1)                  # [B, F]
        a = nn.Dense(reduced, use_bias=False,
                     kernel_init=xavier_normal(), name="squeeze")(z)
        a = jax.nn.relu(a)
        a = nn.Dense(self.num_fields, use_bias=False,
                     kernel_init=xavier_normal(), name="excite")(a)
        a = Activation(self.excitation_activation,
                       hidden_dim=self.num_fields)(a, train=train)
        return feature_emb * a[..., None]


# API-surface aliases for reference imports (fuxictr.pytorch.layers exports
# both names; this module implements the V2 vectorized formulation —
# bilinear_interaction.py:23,87 — verified equivalent across all three
# sharing modes by tests/test_reference_parity.py)
BilinearInteractionV2 = BilinearInteraction
