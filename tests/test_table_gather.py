"""table_gather custom-VJP: forward and backward match jnp.take autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from fuxictr_tpu.ops.embedding import table_gather
from fuxictr_tpu.ops.embedding import table_gather_dedup


def test_forward_matches_take():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 50, (16, 3)))
    np.testing.assert_array_equal(
        np.asarray(table_gather(table, ids)),
        np.asarray(jnp.take(table, ids, axis=0)))


def test_backward_matches_take_with_duplicates():
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(30, 4)).astype(np.float32))
    # heavy duplication to stress the segment-sum path
    ids = jnp.asarray(rng.integers(0, 5, (64,)))
    cot = jnp.asarray(rng.normal(size=(64, 4)).astype(np.float32))

    def f_custom(t):
        return jnp.sum(table_gather_dedup(t, ids) * cot)

    def f_ref(t):
        return jnp.sum(jnp.take(t, ids, axis=0) * cot)

    g_custom = jax.grad(f_custom)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_backward_2d_ids():
    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.normal(size=(20, 6)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 20, (8, 5)))   # sequence-shaped
    cot = jnp.asarray(rng.normal(size=(8, 5, 6)).astype(np.float32))
    g_custom = jax.grad(lambda t: jnp.sum(table_gather_dedup(t, ids) * cot))(table)
    g_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) * cot))(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_under_jit_and_all_ids_equal():
    table = jnp.ones((10, 4))
    ids = jnp.zeros((32,), jnp.int32)     # all the same row
    g = jax.jit(jax.grad(lambda t: jnp.sum(table_gather_dedup(t, ids) * 2.0)))(table)
    expected = np.zeros((10, 4))
    expected[0] = 64.0                    # 32 duplicates × cotangent 2
    np.testing.assert_allclose(np.asarray(g), expected)


def test_table_gather_expand_grad_parity():
    """Fused dedup gather: forward and VJP must equal the plain duplicated
    gather (the backward is a single scatter with the recomposed flat ids)."""
    import numpy as np
    from fuxictr_tpu.ops.embedding import table_gather, table_gather_expand
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    flat = rng.integers(0, 50, 200)
    uniq, inv = np.unique(flat, return_inverse=True)
    ids = np.zeros(200, np.int64)
    ids[:len(uniq)] = uniq
    inv = jnp.asarray(inv.astype(np.int32))
    ids = jnp.asarray(ids)
    cot = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))

    out_plain = table_gather(table, jnp.asarray(flat))
    out_fused = table_gather_expand(table, ids, inv)
    np.testing.assert_allclose(out_fused, out_plain, rtol=1e-6)

    g_plain = jax.grad(
        lambda t: jnp.vdot(table_gather(t, jnp.asarray(flat)), cot))(table)
    g_fused = jax.grad(
        lambda t: jnp.vdot(table_gather_expand(t, ids, inv), cot))(table)
    np.testing.assert_allclose(g_fused, g_plain, rtol=1e-5, atol=1e-6)
