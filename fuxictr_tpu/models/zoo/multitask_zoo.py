"""Multitask models: ShareBottom, MMoE, PLE.

All subclass :class:`MultiTaskModel`; nets emit ``{label}_pred`` logits per
task (reference parity targets cited per class).
"""

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from fuxictr_tpu.models.multitask import MultiTaskModel
from fuxictr_tpu.models.registry import register_model
from fuxictr_tpu.ops.embedding import FeatureEmbedding
from fuxictr_tpu.ops.mlp import MLP_Block, stacked_mlp


def _flat(x):
    return x.reshape(x.shape[0], -1)


def _towers(labels, tower_hidden_units, hidden_activations, net_dropout,
            batch_norm, inputs, train):
    """One MLP tower + 1-dim head per task."""
    outputs = {}
    for i, label in enumerate(labels):
        y = MLP_Block(hidden_units=tuple(tower_hidden_units),
                      hidden_activations=hidden_activations,
                      output_dim=1, dropout_rates=net_dropout,
                      batch_norm=batch_norm,
                      name=f"tower_{i}")(inputs[i], train=train)
        outputs[f"{label}_pred"] = y
    return outputs


# ------------------------------------------------------------ ShareBottom
class _ShareBottomNet(nn.Module):
    """(ref: model_zoo/multitask/ShareBottom/src/ShareBottom.py)"""

    feature_map: Any
    embedding_dim: int = 10
    bottom_hidden_units: Sequence[int] = (64, 64, 64)
    tower_hidden_units: Sequence[int] = (64,)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        bottom = MLP_Block(hidden_units=tuple(self.bottom_hidden_units),
                           hidden_activations=self.hidden_activations,
                           dropout_rates=self.net_dropout,
                           batch_norm=self.batch_norm,
                           name="bottom")(emb, train=train)
        labels = self.feature_map.labels
        return _towers(labels, self.tower_hidden_units,
                       self.hidden_activations, self.net_dropout,
                       self.batch_norm, [bottom] * len(labels), train)


@register_model
class ShareBottom(MultiTaskModel):
    """ShareBottom (ref: model_zoo/multitask/ShareBottom/src/ShareBottom.py)."""

    def __init__(self, feature_map, model_id="ShareBottom", learning_rate=1e-3,
                 embedding_dim=10, bottom_hidden_units=(64, 64, 64),
                 tower_hidden_units=(64,), hidden_activations="relu",
                 net_dropout=0.0, batch_norm=False, **kwargs):
        net = _ShareBottomNet(feature_map, embedding_dim,
                              tuple(bottom_hidden_units),
                              tuple(tower_hidden_units), hidden_activations,
                              net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# ------------------------------------------------------------------- MMoE
class _MMoENet(nn.Module):
    """(ref: model_zoo/multitask/MMoE/src/MMoE.py:24-140): shared experts +
    per-task softmax gates + towers."""

    feature_map: Any
    embedding_dim: int = 10
    num_experts: int = 4
    expert_hidden_units: Sequence[int] = (64, 32)
    gate_hidden_units: Sequence[int] = (32,)
    tower_hidden_units: Sequence[int] = (32,)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        # one [E, d_in, d_out]-batched contraction on the MXU; the expert
        # axis is shardable over 'model' (expert parallelism) — see
        # ops/mlp.py:stacked_mlp
        experts = stacked_mlp(
            self.num_experts, name="experts",
            hidden_units=tuple(self.expert_hidden_units),
            hidden_activations=self.hidden_activations,
            dropout_rates=self.net_dropout,
            batch_norm=self.batch_norm)(emb, train)           # [B, E, D]
        labels = self.feature_map.labels
        task_inputs = []
        for i in range(len(labels)):
            gate = MLP_Block(hidden_units=tuple(self.gate_hidden_units),
                             hidden_activations=self.hidden_activations,
                             output_dim=self.num_experts,
                             dropout_rates=self.net_dropout,
                             batch_norm=self.batch_norm,
                             name=f"gate_{i}")(emb, train=train)
            gate = jax.nn.softmax(gate, axis=-1)
            task_inputs.append(jnp.einsum("be,bed->bd", gate, experts))
        return _towers(labels, self.tower_hidden_units,
                       self.hidden_activations, self.net_dropout,
                       self.batch_norm, task_inputs, train)


@register_model
class MMoE(MultiTaskModel):
    """MMoE (ref: model_zoo/multitask/MMoE/src/MMoE.py:24-140)."""

    def __init__(self, feature_map, model_id="MMoE", learning_rate=1e-3,
                 embedding_dim=10, num_experts=4,
                 expert_hidden_units=(64, 32), gate_hidden_units=(32,),
                 tower_hidden_units=(32,), hidden_activations="relu",
                 net_dropout=0.0, batch_norm=False, **kwargs):
        net = _MMoENet(feature_map, embedding_dim, num_experts,
                       tuple(expert_hidden_units), tuple(gate_hidden_units),
                       tuple(tower_hidden_units), hidden_activations,
                       net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)


# -------------------------------------------------------------------- PLE
class _CGCLayer(nn.Module):
    """(ref: model_zoo/multitask/PLE/src/PLE.py:24-117): per-task specific
    experts + shared experts, gated per task (+ a shared-route gate)."""

    num_shared_experts: int
    num_specific_experts: int
    num_tasks: int
    expert_hidden_units: Sequence[int]
    gate_hidden_units: Sequence[int]
    hidden_activations: Union[str, Sequence[str]]
    net_dropout: float
    batch_norm: bool
    is_last: bool = False

    def _mlp(self, name, out_dim=None):
        return MLP_Block(hidden_units=tuple(self.expert_hidden_units)
                         if out_dim is None else tuple(self.gate_hidden_units),
                         hidden_activations=self.hidden_activations,
                         output_dim=out_dim, dropout_rates=self.net_dropout,
                         batch_norm=self.batch_norm, name=name)

    @nn.compact
    def __call__(self, xs, train=False):
        """xs: list of num_tasks+1 inputs (task_0..task_{T-1}, shared)."""
        T, ns, nsh = (self.num_tasks, self.num_specific_experts,
                      self.num_shared_experts)
        # ALL experts of the layer in one stacked pass (ops/mlp.py:
        # stacked_mlp): stack order = task0 specifics, task1 specifics, ...,
        # shared; per-expert inputs ride the leading stack axis
        stack_in = jnp.stack(
            [xs[i] for i in range(T) for _ in range(ns)]
            + [xs[-1]] * nsh, axis=0)                        # [S, B, d]
        out = stacked_mlp(
            T * ns + nsh, stacked_input=True, name="experts",
            hidden_units=tuple(self.expert_hidden_units),
            hidden_activations=self.hidden_activations,
            dropout_rates=self.net_dropout,
            batch_norm=self.batch_norm)(stack_in, train)     # [B, S, D]
        shared = out[:, T * ns:]
        outs = []
        for i in range(T):
            cand = jnp.concatenate(
                [out[:, i * ns:(i + 1) * ns], shared], axis=1)
            gate = jax.nn.softmax(self._mlp(
                f"gate_{i}", out_dim=ns + nsh)(xs[i], train=train), axis=-1)
            outs.append(jnp.einsum("be,bed->bd", gate, cand))
        if not self.is_last:
            gate = jax.nn.softmax(self._mlp(
                f"gate_{T}", out_dim=nsh)(xs[-1], train=train), axis=-1)
            outs.append(jnp.einsum("be,bed->bd", gate, shared))
        return outs


class _PLENet(nn.Module):
    """(ref: model_zoo/multitask/PLE/src/PLE.py:118-230)"""

    feature_map: Any
    embedding_dim: int = 10
    num_layers: int = 1
    num_shared_experts: int = 1
    num_specific_experts: int = 1
    expert_hidden_units: Sequence[int] = (64, 32)
    gate_hidden_units: Sequence[int] = (32,)
    tower_hidden_units: Sequence[int] = (32,)
    hidden_activations: Union[str, Sequence[str]] = "relu"
    net_dropout: float = 0.0
    batch_norm: bool = False

    @nn.compact
    def __call__(self, batch, train=False):
        emb = FeatureEmbedding(self.feature_map, self.embedding_dim,
                               name="embedding")(batch, flatten_emb=True)
        labels = self.feature_map.labels
        T = len(labels)
        xs = [emb] * (T + 1)
        for li in range(self.num_layers):
            is_last = li == self.num_layers - 1
            xs = _CGCLayer(self.num_shared_experts, self.num_specific_experts,
                           T, tuple(self.expert_hidden_units),
                           tuple(self.gate_hidden_units),
                           self.hidden_activations, self.net_dropout,
                           self.batch_norm, is_last,
                           name=f"cgc_{li}")(xs, train=train)
        return _towers(labels, self.tower_hidden_units,
                       self.hidden_activations, self.net_dropout,
                       self.batch_norm, xs[:T], train)


@register_model
class PLE(MultiTaskModel):
    """PLE (ref: model_zoo/multitask/PLE/src/PLE.py:24-230)."""

    def __init__(self, feature_map, model_id="PLE", learning_rate=1e-3,
                 embedding_dim=10, num_layers=1, num_shared_experts=1,
                 num_specific_experts=1, expert_hidden_units=(64, 32),
                 gate_hidden_units=(32,), tower_hidden_units=(32,),
                 hidden_activations="relu", net_dropout=0.0,
                 batch_norm=False, **kwargs):
        net = _PLENet(feature_map, embedding_dim, num_layers,
                      num_shared_experts, num_specific_experts,
                      tuple(expert_hidden_units), tuple(gate_hidden_units),
                      tuple(tower_hidden_units), hidden_activations,
                      net_dropout, batch_norm)
        super().__init__(feature_map, net=net, model_id=model_id, **kwargs)
        self.compile(lr=learning_rate)
