"""Numeric tests for the ops library (naive-oracle pattern, cf. reference
tests/unit_tests/test_torch_layers_bilinear_interaction.py)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.ops.blocks import fm_pairwise_sum
from fuxictr_tpu.ops.embedding import FeatureEmbedding, parse_feature_encoder
from fuxictr_tpu.ops.interactions import (BilinearInteraction, CrossNet,
                                          CrossNetV2,
                                          HolographicInteraction,
                                          InnerProductInteraction,
                                          InteractionMachine)
from fuxictr_tpu.ops.mlp import MLP_Block
from fuxictr_tpu.ops.pooling import masked_average_pool, masked_sum_pool

TINY = "/root/reference/data"


def _tiny_fm(name="tiny_parquet", emb_dim=4):
    fm = FeatureMap(name, f"{TINY}/{name}")
    fm.load(f"{TINY}/{name}/feature_map.json", {"embedding_dim": emb_dim})
    return fm


def _tiny_batch(fm, batch_size=8, seed=0):
    rng = np.random.default_rng(seed)
    batch = {}
    for name, spec in fm.features.items():
        if spec["type"] == "sequence":
            batch[name] = rng.integers(
                0, spec["vocab_size"], (batch_size, spec["max_len"]),
                dtype=np.int32)
        else:
            batch[name] = rng.integers(
                1, spec["vocab_size"], (batch_size,), dtype=np.int32)
    for label in fm.labels:
        batch[label] = rng.integers(0, 2, (batch_size,)).astype(np.float32)
    return batch


def test_embedding_shapes_and_padding():
    fm = _tiny_fm()
    emb_layer = FeatureEmbedding(fm, embedding_dim=4)
    batch = _tiny_batch(fm)
    batch["userid"][0] = 0  # padding idx
    params = emb_layer.init(jax.random.PRNGKey(0), batch)
    out = emb_layer.apply(params, batch)
    assert out.shape == (8, 14, 4)
    # padding id embeds to zeros
    np.testing.assert_allclose(np.asarray(out)[0, 0], np.zeros(4))
    flat = emb_layer.apply(params, batch, flatten_emb=True)
    assert flat.shape == (8, 56)


def test_embedding_share_embedding_aliases_rows():
    fm = _tiny_fm("tiny_seq")
    emb_layer = FeatureEmbedding(fm, embedding_dim=4)
    batch = _tiny_batch(fm)
    # click_sequence shares adgroup_id's table rows: same id → same vector
    batch["click_sequence"][:, 0] = batch["adgroup_id"]
    params = emb_layer.init(jax.random.PRNGKey(0), batch)
    d = emb_layer.apply(params, batch, method=FeatureEmbedding.embedding_dict)
    np.testing.assert_allclose(np.asarray(d["click_sequence"][:, 0]),
                               np.asarray(d["adgroup_id"]), rtol=1e-6)
    assert d["click_sequence"].shape == (8, 5, 4)


def test_fm_pairwise_matches_naive():
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(4, 6, 5)).astype(np.float32))
    fast = np.asarray(fm_pairwise_sum(emb))
    naive = np.zeros((4, 1), np.float32)
    e = np.asarray(emb)
    for i in range(6):
        for j in range(i + 1, 6):
            naive[:, 0] += (e[:, i] * e[:, j]).sum(-1)
    np.testing.assert_allclose(fast, naive, rtol=1e-4, atol=1e-5)


def test_inner_product_modes():
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(3, 5, 4)).astype(np.float32))
    e = np.asarray(emb)
    for mode, shape in [("product_sum", (3, 1)), ("bi_interaction", (3, 4)),
                        ("inner_product", (3, 10)),
                        ("elementwise_product", (3, 10, 4))]:
        m = InnerProductInteraction(num_fields=5, output=mode)
        out = m.apply(m.init(jax.random.PRNGKey(0), emb), emb)
        assert out.shape == shape
    # inner_product equals naive triu Gram entries
    m = InnerProductInteraction(num_fields=5, output="inner_product")
    out = np.asarray(m.apply(m.init(jax.random.PRNGKey(0), emb), emb))
    k = 0
    for i in range(5):
        for j in range(i + 1, 5):
            np.testing.assert_allclose(out[:, k], (e[:, i] * e[:, j]).sum(-1),
                                       rtol=1e-4, atol=1e-5)
            k += 1


def test_crossnet_v2_matches_recurrence():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    m = CrossNetV2(input_dim=6, num_layers=2)
    params = m.init(jax.random.PRNGKey(0), x0)
    out = np.asarray(m.apply(params, x0))
    p = params["params"]
    xi = np.asarray(x0)
    for i in range(2):
        W = np.asarray(p[f"cross_{i}"]["kernel"])
        b = np.asarray(p[f"cross_{i}"]["bias"])
        xi = xi + np.asarray(x0) * (xi @ W + b)
    np.testing.assert_allclose(out, xi, rtol=1e-5, atol=1e-6)


def test_crossnet_runs():
    x0 = jnp.ones((2, 8))
    m = CrossNet(input_dim=8, num_layers=3)
    out = m.apply(m.init(jax.random.PRNGKey(0), x0), x0)
    assert out.shape == (2, 8)


def test_bilinear_field_all_matches_naive():
    rng = np.random.default_rng(4)
    emb = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    m = BilinearInteraction(num_fields=4, embedding_dim=3,
                            bilinear_type="field_all")
    params = m.init(jax.random.PRNGKey(0), emb)
    out = np.asarray(m.apply(params, emb))
    W = np.asarray(params["params"]["W"])
    e = np.asarray(emb)
    k = 0
    for i in range(4):
        for j in range(i + 1, 4):
            np.testing.assert_allclose(out[:, k], (e[:, i] @ W) * e[:, j],
                                       rtol=1e-4, atol=1e-5)
            k += 1


def test_holographic_circular_convolution():
    rng = np.random.default_rng(5)
    emb = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
    m = HolographicInteraction(num_fields=3,
                               interaction_type="circular_convolution")
    out = np.asarray(m.apply(m.init(jax.random.PRNGKey(0), emb), emb))
    e = np.asarray(emb)
    # naive circular convolution for pair (0, 1)
    a, b = e[:, 0], e[:, 1]
    naive = np.zeros_like(a)
    n = a.shape[-1]
    for t in range(n):
        for k in range(n):
            naive[:, t] += a[:, k] * b[:, (t - k) % n]
    np.testing.assert_allclose(out[:, 0], naive, rtol=1e-4, atol=1e-5)


def test_interaction_machine_order2_matches_naive():
    rng = np.random.default_rng(6)
    emb = jnp.asarray(rng.normal(size=(3, 5, 4)).astype(np.float32))
    m = InteractionMachine(embedding_dim=4, order=2)
    params = m.init(jax.random.PRNGKey(0), emb)
    e = np.asarray(emb)
    p1 = e.sum(1)
    # order-2 term = Σ_{i<j} v_i∘v_j = (p1² − Σv²)/2
    expected2 = (p1 ** 2 - (e ** 2).sum(1)) / 2
    W = np.asarray(params["params"]["fc"]["kernel"])
    b = np.asarray(params["params"]["fc"]["bias"])
    expected = np.concatenate([p1, expected2], -1) @ W + b
    out = np.asarray(m.apply(params, emb))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_masked_pooling():
    emb = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    mask = jnp.asarray([[1, 1, 0], [1, 0, 0]])
    avg = np.asarray(masked_average_pool(emb, mask))
    np.testing.assert_allclose(avg[0], np.asarray(emb)[0, :2].mean(0))
    np.testing.assert_allclose(avg[1], np.asarray(emb)[1, 0])
    s = np.asarray(masked_sum_pool(emb, mask))
    np.testing.assert_allclose(s[0], np.asarray(emb)[0, :2].sum(0))


def test_mlp_block_shapes_and_bn():
    x = jnp.ones((4, 16))
    m = MLP_Block(hidden_units=(8, 8), output_dim=1, batch_norm=True,
                  dropout_rates=0.5, hidden_activations=["relu", "dice"])
    variables = m.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x, train=True)
    out, updated = m.apply(variables, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
    assert out.shape == (4, 1)
    assert "batch_stats" in updated
    out_eval = m.apply(variables, x, train=False)
    assert out_eval.shape == (4, 1)


def test_parse_feature_encoder():
    assert parse_feature_encoder("layers.MaskedAveragePooling()") == \
        [("pool", "average")]
    assert parse_feature_encoder(
        ["layers.MaskedSumPooling()", "nn.Linear(64, 16, bias=False)"]) == \
        [("pool", "sum"), ("linear", 16, False)]
    with pytest.raises(ValueError):
        parse_feature_encoder("__import__('os')")


def test_kmax_pooling_preserves_positional_order():
    """Reference KMaxPooling keeps the original order of the top-k values."""
    from fuxictr_tpu.ops.pooling import KMaxPooling
    x = jnp.asarray([[5.0, 1.0, 9.0, 3.0, 7.0]])
    out = KMaxPooling(k=3, axis=-1)(x)
    # top-3 values are 9, 7, 5 at positions 2, 4, 0 → positional order 5, 9, 7
    np.testing.assert_array_equal(np.asarray(out), [[5.0, 9.0, 7.0]])
