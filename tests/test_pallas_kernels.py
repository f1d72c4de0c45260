"""Flash target-attention kernel: numerics vs the XLA path (interpret mode
on CPU; the real Mosaic compile is exercised by the TPU bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fuxictr_tpu.ops.pallas_kernels import (_xla_target_attention,
                                            flash_target_attention)


@pytest.mark.parametrize("B,L,D", [(8, 64, 16), (5, 100, 24)])
def test_flash_matches_xla(B, L, D):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, L)) > 0.3).astype(np.float32))
    # ensure no fully-masked rows for the reference comparison
    mask = mask.at[:, 0].set(1.0)
    ref = _xla_target_attention(q, k, v, mask, float(np.sqrt(D)))
    out = flash_target_attention(q, k, v, mask, block_b=8, block_l=32,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_fully_masked_row_is_finite():
    B, L, D = 4, 32, 8
    q = jnp.ones((B, D))
    k = jnp.ones((B, L, D))
    v = jnp.ones((B, L, D))
    mask = jnp.zeros((B, L)).at[1:, 0].set(1.0)   # row 0 fully masked
    out = flash_target_attention(q, k, v, mask, block_b=4, block_l=16,
                                 interpret=True)
    assert np.isfinite(np.asarray(out)).all()
