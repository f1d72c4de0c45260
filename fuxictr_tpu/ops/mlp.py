"""Configurable MLP tower.

Layer ordering parity with the reference MLP_Block
(/root/reference/fuxictr/pytorch/layers/blocks/mlp_block.py:54-88):
Dense → BatchNorm (optional, or once on the input) → activation → dropout,
with an optional output Dense + activation. Kernel init is xavier-normal and
bias zero, matching the reference's global ``reset_parameters``.
"""

from typing import Any, Sequence, Union

import flax.linen as nn

from fuxictr_tpu.ops.common import Activation, xavier_normal, zeros_init


def stacked_mlp(num_stack, stacked_input=False, name=None, **mlp_kwargs):
    """``num_stack`` independent :class:`MLP_Block` towers evaluated as ONE
    batched contraction (``bi,sio->bso``) instead of ``num_stack``
    sequential small matmuls — the TPU-idiomatic form for expert stacks
    (MMoE/PLE; cf. the per-expert ModuleList loop in the reference,
    model_zoo/multitask/MMoE/src/MMoE.py:42-50). Each parameter leaf
    carries a leading stack axis ([S, d_in, d_out] kernels), which the
    mesh sharding rule (parallel/mesh.py:param_sharding) row-shards over
    the ``model`` axis — i.e. true expert parallelism: each shard computes
    its S/n experts locally and XLA all-gathers the [B, S, D] expert
    outputs for the gate mix.

    ``stacked_input=False`` broadcasts one [B, d] input to all stack
    members; ``True`` expects [S, B, d] per-member inputs (PLE CGC).
    Returns outputs stacked on axis 1: [B, S, ...].
    """
    vmapped = nn.vmap(
        MLP_Block,
        in_axes=(0 if stacked_input else None, None),
        out_axes=1,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        axis_size=num_stack)
    return vmapped(name=name, **mlp_kwargs)


class MLP_Block(nn.Module):
    input_dim: int = None  # accepted for config parity; shapes are inferred
    hidden_units: Sequence[int] = ()
    hidden_activations: Union[str, Sequence[str]] = "relu"
    output_dim: int = None
    output_activation: Any = None
    dropout_rates: Union[float, Sequence[float]] = 0.0
    batch_norm: bool = False
    bn_only_once: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        n = len(self.hidden_units)
        dropout = self.dropout_rates
        if not isinstance(dropout, (list, tuple)):
            dropout = [dropout] * n
        acts = self.hidden_activations
        if not isinstance(acts, (list, tuple)):
            acts = [acts] * n
        if self.batch_norm and self.bn_only_once:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        for i, units in enumerate(self.hidden_units):
            x = nn.Dense(units, use_bias=self.use_bias,
                         kernel_init=xavier_normal(), bias_init=zeros_init)(x)
            if self.batch_norm and not self.bn_only_once:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            if acts[i]:
                x = Activation(acts[i], hidden_dim=units)(x, train=train)
            if dropout[i] > 0:
                x = nn.Dropout(rate=dropout[i], deterministic=not train)(x)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, use_bias=self.use_bias,
                         kernel_init=xavier_normal(), bias_init=zeros_init)(x)
        if self.output_activation is not None:
            x = Activation(self.output_activation)(x, train=train)
        return x
