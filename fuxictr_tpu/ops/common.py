"""Registries for config-string-named activations, initializers, regularizers.

The reference resolves these with ``eval()`` / ``getattr`` on torch namespaces
(/root/reference/fuxictr/pytorch/torch_utils.py:58-195). Here every accepted
string is parsed explicitly — no code execution from config files.
"""

import re

import flax.linen as nn
import jax
import jax.numpy as jnp

# --------------------------------------------------------------------- init
xavier_normal = jax.nn.initializers.glorot_normal
zeros_init = jax.nn.initializers.zeros


def get_initializer(spec):
    """Map initializer config strings to flax initializers.

    Accepts the reference's torch-flavoured strings (e.g.
    ``"partial(nn.init.normal_, std=1e-4)"``) as well as plain names
    (``"normal(std=1e-4)"``, ``"xavier_normal"``, ``"xavier_uniform"``).
    """
    if callable(spec):
        return spec
    s = str(spec)
    m = re.search(r"normal_?\s*[,(].*?std\s*=\s*([0-9eE.+-]+)", s)
    if ("normal_" in s or s.startswith("normal")) and "xavier" not in s \
            and "kaiming" not in s:
        std = float(m.group(1)) if m else 0.01
        return jax.nn.initializers.normal(stddev=std)
    if "xavier_normal" in s or "glorot_normal" in s:
        return jax.nn.initializers.glorot_normal()
    if "xavier_uniform" in s or "glorot_uniform" in s:
        return jax.nn.initializers.glorot_uniform()
    if "kaiming_normal" in s or "he_normal" in s:
        return jax.nn.initializers.he_normal()
    if "kaiming_uniform" in s or "he_uniform" in s:
        return jax.nn.initializers.he_uniform()
    m = re.search(r"uniform_?\s*[,(].*?[ab]\s*=\s*([0-9eE.+-]+)", s)
    if "uniform" in s:
        bound = float(m.group(1)) if m else 0.05
        return jax.nn.initializers.uniform(scale=bound)
    if "zeros" in s:
        return jax.nn.initializers.zeros
    raise ValueError(f"initializer={spec} is not supported.")


# -------------------------------------------------------------- regularizer
def get_regularizer(reg):
    """Parse a reg spec into [(p_norm, weight)]: float→L2, "l1(x)", "l2(x)",
    "l1_l2(x,y)" — same grammar as the reference."""
    reg_pair = []
    if isinstance(reg, (int, float)):
        if reg != 0:
            reg_pair.append((2, float(reg)))
    elif isinstance(reg, str):
        if reg.startswith("l1(") or reg.startswith("l2("):
            reg_pair.append((int(reg[1]), float(reg.rstrip(")").split("(")[-1])))
        elif reg.startswith("l1_l2"):
            l1_reg, l2_reg = reg.rstrip(")").split("(")[-1].split(",")
            reg_pair.append((1, float(l1_reg)))
            reg_pair.append((2, float(l2_reg)))
        else:
            raise NotImplementedError(f"regularizer={reg} is not supported.")
    elif reg is not None:
        raise NotImplementedError(f"regularizer={reg} is not supported.")
    return reg_pair


# -------------------------------------------------------------- activations
class Dice(nn.Module):
    """Data-adaptive activation (DIN): p = sigmoid(BN(x));
    out = p*x + (1-p)*alpha*x with a learnable per-unit alpha."""

    input_dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, train=False):
        bn = nn.BatchNorm(use_running_average=not train, use_bias=False,
                          use_scale=False, epsilon=self.eps, momentum=0.9)
        p = jax.nn.sigmoid(bn(x))
        alpha = self.param("alpha", zeros_init, (self.input_dim,))
        return p * x + (1.0 - p) * alpha * x


_SIMPLE_ACTS = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "softplus": jax.nn.softplus,
    "leakyrelu": jax.nn.leaky_relu,
    "leaky_relu": jax.nn.leaky_relu,
    "softmax": lambda x: jax.nn.softmax(x, axis=-1),
    "identity": lambda x: x,
    "linear": lambda x: x,
    "none": lambda x: x,
}


class Activation(nn.Module):
    """Activation wrapper usable uniformly for stateless fns and parametric
    activations (PReLU/Dice, which carry parameters / batch stats)."""

    activation: str = "relu"
    hidden_dim: int = None

    @nn.compact
    def __call__(self, x, train=False):
        name = (self.activation or "none").lower()
        if name == "dice":
            return Dice(self.input_or(x))(x, train=train)
        if name == "prelu":
            alpha = self.param(
                "alpha", lambda k, s: jnp.full(s, 0.1), (self.input_or(x),))
            return jnp.where(x >= 0, x, alpha * x)
        if name in _SIMPLE_ACTS:
            return _SIMPLE_ACTS[name](x)
        raise ValueError(f"activation={self.activation} is not supported.")

    def input_or(self, x):
        return self.hidden_dim if self.hidden_dim is not None else x.shape[-1]


def get_activation(activation, hidden_units=None):
    """Return a callable ``fn(x)`` for stateless names; parametric names
    (dice/prelu) must go through :class:`Activation` inside a module."""
    if callable(activation):
        return activation
    if isinstance(activation, list):
        if hidden_units is not None:
            return [get_activation(a, u) for a, u in zip(activation, hidden_units)]
        return [get_activation(a) for a in activation]
    name = (activation or "none").lower()
    if name in _SIMPLE_ACTS:
        return _SIMPLE_ACTS[name]
    if name in ("dice", "prelu"):
        return None  # caller must instantiate Activation module
    raise ValueError(f"activation={activation} is not supported.")
