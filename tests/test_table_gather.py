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


def test_table_gather_expand_multi_grad_parity():
    """Fused k-field expand: forward and table-VJP must equal k separate
    plain gathers with per-field pad masks."""
    import numpy as np
    from fuxictr_tpu.ops.embedding import table_gather_expand_multi
    rng = np.random.default_rng(1)
    table = jnp.asarray(rng.normal(size=(70, 8)).astype(np.float32))
    flat_a = rng.integers(0, 30, 150)           # field a: rows 0..29, pad 0
    flat_b = rng.integers(30, 70, 150)          # field b: rows 30..69
    uniq, inv = np.unique(flat_a, return_inverse=True)
    U = 48
    ids_a = np.zeros(U, np.int64)
    ids_a[:len(uniq)] = uniq
    # field b rows keyed by the same inverse (same item, different feature)
    b_of_uniq = rng.integers(30, 70, U)
    ids_b = b_of_uniq
    mask_a = ids_a != 0
    mask_b = np.ones(U, bool)
    ids = jnp.asarray(np.stack([ids_a, ids_b]))
    masks = jnp.asarray(np.stack([mask_a, mask_b]))
    inv = jnp.asarray(inv.astype(np.int32))
    cot = jnp.asarray(rng.normal(size=(150, 16)).astype(np.float32))

    def reference(t):
        a = jnp.take(t, jnp.asarray(ids_a), axis=0) \
            * jnp.asarray(mask_a)[:, None]
        b = jnp.take(t, jnp.asarray(ids_b), axis=0) \
            * jnp.asarray(mask_b)[:, None]
        return jnp.take(jnp.concatenate([a, b], axis=-1), inv, axis=0)

    out_ref = reference(table)
    out_multi = table_gather_expand_multi(table, ids, inv, masks)
    np.testing.assert_allclose(out_multi, out_ref, rtol=1e-6)

    g_ref = jax.grad(lambda t: jnp.vdot(reference(t), cot))(table)
    g_multi = jax.grad(lambda t: jnp.vdot(
        table_gather_expand_multi(t, ids, inv, masks), cot))(table)
    np.testing.assert_allclose(g_multi, g_ref, rtol=1e-5, atol=1e-6)
