"""Cross-framework numeric parity: our JAX layers vs the reference's
PyTorch layers with IDENTICAL weights on identical inputs.

The reference package is imported read-only from /root/reference with
minimal stubs for its unavailable deps (polars, keras_preprocessing).
This is the strongest correctness oracle available in this environment —
the same role as the reference's own BilinearInteraction V1-vs-V2 unit
test (tests/unit_tests/test_torch_layers_bilinear_interaction.py), but
across frameworks.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

_STUBS = os.path.join(os.path.dirname(__file__), "_ref_stubs")
for p in ("/root/reference", _STUBS):
    if p not in sys.path:
        sys.path.insert(0, p)

torch = pytest.importorskip("torch")
try:
    from fuxictr.pytorch import layers as ref_layers
except Exception as exc:  # pragma: no cover
    pytest.skip(f"reference not importable: {exc}", allow_module_level=True)

import fuxictr_tpu.ops.interactions as ours

RTOL, ATOL = 1e-5, 1e-5


def _np(x):
    return x.detach().numpy() if hasattr(x, "detach") else np.asarray(x)


def _emb(b=6, f=5, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, f, d)).astype(np.float32)


def test_inner_product_all_modes():
    x = _emb()
    for mode in ["product_sum", "bi_interaction", "inner_product",
                 "elementwise_product"]:
        ref = ref_layers.InnerProductInteraction(5, output=mode)
        got_ref = _np(ref(torch.from_numpy(x)))
        m = ours.InnerProductInteraction(5, output=mode)
        got = m.apply(m.init(jax.random.PRNGKey(0), jnp.asarray(x)),
                      jnp.asarray(x))
        np.testing.assert_allclose(_np(got), got_ref, rtol=RTOL, atol=ATOL,
                                   err_msg=mode)


def test_crossnet_v1():
    D, L = 8, 3
    x = _emb(f=1, d=D)[:, 0, :]
    m = ours.CrossNet(D, L)
    params = m.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    ref = ref_layers.CrossNet(D, L)
    with torch.no_grad():
        for i in range(L):
            ref.cross_net[i].weight.weight.copy_(
                torch.from_numpy(np.asarray(params[f"w_{i}"]).T))
            ref.cross_net[i].bias.copy_(
                torch.from_numpy(np.asarray(params[f"b_{i}"])))
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=RTOL, atol=ATOL)


def test_crossnet_v2():
    D, L = 8, 3
    x = _emb(f=1, d=D)[:, 0, :]
    m = ours.CrossNetV2(D, L)
    params = m.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"]
    ref = ref_layers.CrossNetV2(D, L)
    with torch.no_grad():
        for i in range(L):
            ref.cross_layers[i].weight.copy_(torch.from_numpy(
                np.asarray(params[f"cross_{i}"]["kernel"]).T))
            ref.cross_layers[i].bias.copy_(torch.from_numpy(
                np.asarray(params[f"cross_{i}"]["bias"])))
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("btype", ["field_all", "field_each",
                                   "field_interaction"])
def test_bilinear_v2(btype):
    F, D = 5, 8
    x = _emb(f=F, d=D, seed=3)
    m = ours.BilinearInteraction(F, D, btype)
    params = m.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    ref = ref_layers.BilinearInteractionV2(F, D, btype)
    with torch.no_grad():
        W = np.asarray(params["W"])
        if btype == "field_all":
            ref.bilinear_W.copy_(torch.from_numpy(W))
        else:
            ref.bilinear_W.copy_(torch.from_numpy(W))
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=RTOL, atol=ATOL, err_msg=btype)


def test_compressed_interaction_net():
    F, D = 5, 8
    units = [6, 4]
    x = _emb(f=F, d=D, seed=4)
    m = ours.CompressedInteractionNet(F, tuple(units), output_dim=1)
    params = m.init(jax.random.PRNGKey(4), jnp.asarray(x))["params"]
    ref = ref_layers.CompressedInteractionNet(F, units, output_dim=1)
    with torch.no_grad():
        prev = F
        for i, u in enumerate(units):
            # ref Conv1d weight [u, prev*F, 1] ↔ ours conv_i [prev*F, u]
            ref_conv = getattr(ref.cin_layer, f"layer_{i+1}")
            ref_conv.weight.copy_(torch.from_numpy(
                np.asarray(params[f"conv_{i}"]).T[:, :, None]))
            ref_conv.bias.copy_(torch.from_numpy(
                np.asarray(params[f"conv_bias_{i}"])))
            prev = u
        ref.fc.weight.copy_(torch.from_numpy(
            np.asarray(params["fc"]["kernel"]).T))
        ref.fc.bias.copy_(torch.from_numpy(np.asarray(params["fc"]["bias"])))
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=RTOL, atol=ATOL)


def test_squeeze_excitation():
    F, D = 6, 8
    x = _emb(f=F, d=D, seed=5)
    m = ours.SqueezeExcitation(F, reduction_ratio=2,
                               excitation_activation="relu")
    params = m.init(jax.random.PRNGKey(5), jnp.asarray(x))["params"]
    ref = ref_layers.SqueezeExcitation(F, 2, "ReLU")
    with torch.no_grad():
        ref.excitation[0].weight.copy_(torch.from_numpy(
            np.asarray(params["squeeze"]["kernel"]).T))
        ref.excitation[2].weight.copy_(torch.from_numpy(
            np.asarray(params["excite"]["kernel"]).T))
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=RTOL, atol=ATOL)


def test_holographic_interaction():
    F, D = 5, 8
    x = _emb(f=F, d=D, seed=6)
    for itype in ["hadamard_product", "circular_convolution",
                  "circular_correlation"]:
        ref = ref_layers.HolographicInteraction(F, interaction_type=itype)
        m = ours.HolographicInteraction(F, interaction_type=itype)
        got = m.apply(m.init(jax.random.PRNGKey(6), jnp.asarray(x)),
                      jnp.asarray(x))
        np.testing.assert_allclose(
            _np(got), _np(ref(torch.from_numpy(x))), rtol=1e-4, atol=1e-4,
            err_msg=itype)


def test_interaction_machine():
    D = 8
    x = _emb(f=6, d=D, seed=7)
    m = ours.InteractionMachine(D, order=5)
    params = m.init(jax.random.PRNGKey(7), jnp.asarray(x))["params"]
    ref = ref_layers.InteractionMachine(D, order=5)
    with torch.no_grad():
        ref.fc.weight.copy_(torch.from_numpy(
            np.asarray(params["fc"]["kernel"]).T))
        ref.fc.bias.copy_(torch.from_numpy(np.asarray(params["fc"]["bias"])))
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=1e-4, atol=1e-4)


def test_mlp_block():
    from fuxictr_tpu.ops.mlp import MLP_Block as OurMLP
    D = 8
    x = _emb(f=1, d=D, seed=8)[:, 0, :]
    m = OurMLP(hidden_units=(16, 4), hidden_activations="relu", output_dim=1)
    params = m.init(jax.random.PRNGKey(8), jnp.asarray(x))["params"]
    ref = ref_layers.MLP_Block(input_dim=D, hidden_units=[16, 4],
                               hidden_activations="ReLU", output_dim=1)
    lins = [mod for mod in ref.mlp if isinstance(mod, torch.nn.Linear)]
    with torch.no_grad():
        for lin, key in zip(lins, ["Dense_0", "Dense_1", "Dense_2"]):
            lin.weight.copy_(torch.from_numpy(
                np.asarray(params[key]["kernel"]).T))
            lin.bias.copy_(torch.from_numpy(np.asarray(params[key]["bias"])))
    got = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=RTOL, atol=ATOL)


def test_masked_pooling():
    from fuxictr_tpu.ops.pooling import (MaskedAveragePooling,
                                         MaskedSumPooling)
    x = _emb(b=4, f=6, d=8, seed=9)
    x[:, 3:, :] = 0.0            # zero rows = masked by inference
    for ref_cls, our_cls in [(ref_layers.MaskedAveragePooling,
                              MaskedAveragePooling),
                             (ref_layers.MaskedSumPooling,
                              MaskedSumPooling)]:
        got = our_cls()(jnp.asarray(x))
        np.testing.assert_allclose(
            _np(got), _np(ref_cls()(torch.from_numpy(x))),
            rtol=RTOL, atol=ATOL)


def test_scaled_dot_product_attention():
    from fuxictr_tpu.ops.attention import scaled_dot_product_attention
    rng = np.random.default_rng(10)
    q = rng.normal(size=(4, 6, 8)).astype(np.float32)
    k = rng.normal(size=(4, 10, 8)).astype(np.float32)
    v = rng.normal(size=(4, 10, 8)).astype(np.float32)
    ref = ref_layers.ScaledDotProductAttention(dropout_rate=0)
    got_ref, _ = ref(torch.from_numpy(q), torch.from_numpy(k),
                     torch.from_numpy(v), scale=np.sqrt(8.0))
    got, _ = scaled_dot_product_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=np.sqrt(8.0))
    np.testing.assert_allclose(_np(got), _np(got_ref), rtol=RTOL, atol=ATOL)


def test_dice_activation():
    from fuxictr_tpu.ops.common import Dice as OurDice
    x = _emb(b=16, f=1, d=8, seed=11)[:, 0, :]
    m = OurDice(8)
    variables = m.init(jax.random.PRNGKey(11), jnp.asarray(x), train=False)
    ref = ref_layers.Dice(8)
    ref.eval()
    with torch.no_grad():
        ref.alpha.copy_(torch.from_numpy(np.asarray(
            variables["params"]["alpha"])))
    got = m.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(_np(got), _np(ref(torch.from_numpy(x))),
                               rtol=1e-4, atol=1e-4)
