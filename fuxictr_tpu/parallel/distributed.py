"""Multi-host (multi-process) runtime: initialization + global data placement.

The reference has no distributed layer at all — its only inter-process
mechanism is the tuner's subprocess scheduler
(/root/reference/fuxictr/autotuner.py:146-179). This module is the DCN /
multi-host half of the new TPU architecture (SURVEY.md §2.6 disposition):

- :func:`maybe_initialize` wires the processes into one JAX runtime via
  ``jax.distributed.initialize`` (coordinator + process id from params or
  ``FUXICTR_*`` env vars — one env per host, as a TPU pod launcher sets).
- Each process feeds only its LOCAL shard of the global batch; the loaders
  already shard part files per host (``host_id``/``num_hosts``), and
  :func:`mesh.shard_batch` assembles the global arrays with
  ``jax.make_array_from_process_local_data``.
- The jitted train step is unchanged: GSPMD partitions it over the global
  mesh, with XLA collectives riding ICI within a slice and DCN across
  hosts.

Covered by tests/test_distributed.py: a 2-process x 4-CPU-device run whose
loss trajectory matches the single-process 8-device run exactly.
"""

import logging
import os

import jax


def maybe_initialize(params=None):
    """Initialize ``jax.distributed`` when a coordinator is configured.

    Reads ``coordinator_address`` / ``num_processes`` / ``process_id`` from
    ``params`` (YAML/CLI) or the env vars ``FUXICTR_COORDINATOR``,
    ``FUXICTR_NUM_PROCESSES``, ``FUXICTR_PROCESS_ID``. Returns True when
    running multi-process (after initialize), False for the single-process
    path (no-op).
    """
    params = params or {}
    env = os.environ
    coord = params.get("coordinator_address") or env.get("FUXICTR_COORDINATOR")
    if not coord:
        return False
    num_processes = int(params.get("num_processes")
                        or env.get("FUXICTR_NUM_PROCESSES", "1"))
    process_id = params.get("process_id")
    if process_id is None:
        process_id = env.get("FUXICTR_PROCESS_ID", "0")
    process_id = int(process_id)
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("jax.distributed initialized: process %d/%d, %d/%d devices",
                 jax.process_index(), jax.process_count(),
                 len(jax.local_devices()), jax.device_count())
    return num_processes > 1


def is_multiprocess():
    return jax.process_count() > 1


def all_gather_host(x, tiled=True):
    """Gather to every host as numpy: a global (non-addressable) jax.Array
    resolves to its full global value; a per-process host array is
    concatenated along axis 0 in process order (matching the 'data'-axis
    device order of :func:`mesh.make_mesh`). The eval-path bridge for
    multi-host runs."""
    import numpy as np
    from jax.experimental import multihost_utils
    if not is_multiprocess():
        return np.asarray(x)
    if isinstance(x, jax.Array) and x.is_fully_addressable:
        x = np.asarray(x)
    gathered = multihost_utils.process_allgather(x, tiled=tiled)
    return np.asarray(gathered)
