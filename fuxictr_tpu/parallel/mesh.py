"""Device-mesh utilities: 2-axis (data x model) SPMD layout.

The reference has no distributed layer at all (SURVEY.md §2.6; its only
multi-device feature is a subprocess grid-search scheduler at
/root/reference/fuxictr/autotuner.py:146-179). This module is the new
TPU-native architecture: a 2-axis ``jax.sharding.Mesh``

  - ``data``  : batch dimension (pure data parallelism; gradients are
                reduced by XLA-inserted psums over ICI),
  - ``model`` : embedding-table rows (the only large tensors in CTR
                models; a fused-table gather from a row-sharded table
                becomes an XLA all-gather/all-to-all over ICI).

Dense towers are tiny (<1M params) and stay replicated; their gradient
psum rides the same collective schedule.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a (data, model) mesh over ``devices`` (default: all)."""
    devices = list(devices) if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    if n_data * n_model > n_total:
        raise ValueError(
            f"mesh shape data={n_data} x model={n_model} needs more than "
            f"the {n_total} available devices")
    devices = devices[:n_data * n_model]
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_spec(ndim):
    """Leading-axis 'data' partition for a rank-``ndim`` array."""
    return P(*(("data",) + (None,) * (ndim - 1)))


def batch_sharding(mesh, leaf):
    return NamedSharding(mesh, batch_spec(np.ndim(leaf)))


def _put(mesh, x, sharding):
    """Place host data on a (possibly multi-process) mesh.

    Single-process: plain device_put. Multi-process: this host holds only
    its LOCAL slice of every batch-aligned array, so global arrays are
    assembled with ``make_array_from_process_local_data``; replicated
    entries are identical on all hosts and device_put handles them."""
    x = np.asarray(x)
    if jax.process_count() == 1 or sharding.is_fully_replicated:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, x)


def shard_batch(mesh, batch):
    """Place a host batch dict on the mesh, sharded over 'data'.

    Side-table entries (the LongCTR ``__items__`` dict: unique item rows +
    inverse index) are NOT batch-aligned — their leading dim is the unique
    count / flat length, not B — so they are replicated; GSPMD re-shards
    the expanded rows where they meet the data-sharded tensors."""
    out = {}
    for key, value in batch.items():
        if key == "__items__" or key.startswith("__cache"):
            # device-cache blocks / side tables: not batch-aligned -> replicate
            out[key] = jax.tree_util.tree_map(
                lambda x: _put(mesh, x, NamedSharding(mesh, P())), value)
        else:
            out[key] = jax.tree_util.tree_map(
                lambda x: _put(mesh, x, batch_sharding(mesh, x)), value)
    return out


def _is_table_leaf(path, leaf):
    """Embedding-table leaves (the only params large enough to shard)."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return any(str(n).startswith(("table_", "pretrain_")) for n in names)


def _is_expert_stack_leaf(path):
    """Stacked expert leaves (ops/mlp.py:stacked_mlp — leading axis =
    expert index; MMoE/PLE name their stacks 'experts')."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    return any(str(n) == "experts" for n in names)


def param_sharding(mesh, path, leaf):
    """Sharding rule: embedding tables row-sharded over 'model' (when rows
    divide evenly); expert stacks sharded over 'model' on the expert axis
    (expert parallelism); everything else replicated."""
    n_model = mesh.shape["model"]
    if (_is_table_leaf(path, leaf) and leaf.ndim >= 2
            and leaf.shape[0] % n_model == 0 and n_model > 1):
        return NamedSharding(mesh, P("model", *(None,) * (leaf.ndim - 1)))
    if (_is_expert_stack_leaf(path) and leaf.ndim >= 1
            and leaf.shape[0] % n_model == 0 and n_model > 1):
        return NamedSharding(mesh, P("model", *(None,) * (leaf.ndim - 1)))
    return NamedSharding(mesh, P())


def shard_params(mesh, params):
    """Place a params pytree on the mesh per :func:`param_sharding`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(leaf, param_sharding(mesh, path, leaf)),
        params)
