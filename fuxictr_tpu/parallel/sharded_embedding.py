"""Explicit row-sharded embedding lookup over the `model` mesh axis.

GSPMD already partitions ``jnp.take`` from a row-sharded table (gather
local + mask + psum); this module spells the same pattern out with
``shard_map`` so the communication is explicit and controllable — the
production path when auto-partitioning makes poor choices, and the seam
where a Pallas remote-DMA kernel would slot in.

Pattern (cf. the scaling-book all-to-all embedding recipe):
  every chip holds ``rows/n_model`` contiguous table rows; ids are
  replicated along `model`; each chip gathers the ids that fall in its
  shard (others → row 0 of its shard, masked to zero) and a single
  ``psum`` over `model` reconstructs the full lookup, batch-sharded over
  `data`.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def sharded_table_gather(mesh, table, ids):
    """Gather rows from a `model`-axis row-sharded table.

    table: [R, D] placed with P('model', None); ids: [B, ...] placed with
    P('data', ...). Returns [B, ..., D] sharded P('data', ...).
    """
    n_model = mesh.shape["model"]
    shard_rows = table.shape[0] // n_model
    ids_spec = P(*(("data",) + (None,) * (ids.ndim - 1)))
    out_spec = P(*(("data",) + (None,) * ids.ndim))

    def local_fn(table_shard, ids_local):
        # position of this chip along the model axis
        m = jax.lax.axis_index("model")
        lo = m * shard_rows
        local = ids_local - lo
        in_shard = (local >= 0) & (local < shard_rows)
        safe = jnp.where(in_shard, local, 0)
        rows = jnp.take(table_shard, safe, axis=0)
        rows = rows * in_shard[..., None].astype(rows.dtype)
        return jax.lax.psum(rows, axis_name="model")

    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(P("model", None), ids_spec),
        out_specs=out_spec,
        check_rep=False,
    )(table, ids)
