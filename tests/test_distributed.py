"""Multi-host correctness: 2 JAX processes x 4 CPU devices each, joined via
jax.distributed, must reproduce the single-process 8-device run exactly.

The reference has nothing distributed to test (SURVEY.md §4) — this guards
the new multi-host architecture: per-process input sharding
(``make_array_from_process_local_data``), GSPMD train steps over a global
(data x model) mesh, and the process_allgather eval bridge.
"""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from fuxictr_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize() == %(multi)s
    assert jax.device_count() == 8, jax.device_count()

    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.parallel import make_mesh
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    fm = make_synthetic_feature_map(num_categorical=4, num_numeric=2,
                                    vocab_size=64, embedding_dim=4)
    fm.group_id = "C1"     # grouped metrics ride the streaming device path
    m = DNN(fm, embedding_dim=4, hidden_units=(16,),
            model_root="/tmp/dist_test_%(tag)s", batch_norm=False)
    m.init_params()
    mesh = make_mesh(n_data=4, n_model=2)
    m.distribute(mesh)
    step = m._make_train_step()

    B_GLOBAL = 32
    n_local = B_GLOBAL // jax.process_count()
    lo = jax.process_index() * n_local
    losses = []
    for s in range(4):
        gb = make_synthetic_batch(fm, B_GLOBAL, seed=s)   # same on all procs
        local = {k: v[lo:lo + n_local] for k, v in gb.items()}
        placed = m._place_batch(local)
        m.state, loss = step(m.state, placed, jax.random.PRNGKey(s))
        losses.append(float(loss))

    # eval bridge: metrics must come out identical on every process
    valid = make_synthetic_batch(fm, B_GLOBAL, seed=99)
    local_valid = {k: v[lo:lo + n_local] for k, v in valid.items()}
    logs = m.evaluate([local_valid], metrics=["AUC", "logloss", "gAUC"])
    print("LOSSES", " ".join("%%.8f" %% l for l in losses))
    print("EVAL", "%%.8f %%.8f %%.8f" %% (logs["AUC"], logs["logloss"],
                                          logs["gAUC"]))
""")


def _run_worker(tag, multi, env_extra, timeout=420):
    env = dict(os.environ)
    env.update({
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4"
        if multi else "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",       # keep the axon TPU plugin out
        "JAX_PLATFORMS": "cpu",
    })
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-c", WORKER % {"repo": REPO, "multi": multi,
                                         "tag": tag}],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _parse(out):
    losses = eval_line = None
    for line in out.splitlines():
        if line.startswith("LOSSES"):
            losses = [float(x) for x in line.split()[1:]]
        if line.startswith("EVAL"):
            eval_line = [float(x) for x in line.split()[1:]]
    return losses, eval_line


def test_two_process_matches_single_process():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    workers = [
        _run_worker(f"mp{i}", True, {
            "FUXICTR_COORDINATOR": coord,
            "FUXICTR_NUM_PROCESSES": "2",
            "FUXICTR_PROCESS_ID": str(i),
        }) for i in range(2)]
    single = _run_worker("sp", False, {})

    outs = []
    for p in workers + [single]:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)

    l0, e0 = _parse(outs[0])
    l1, e1 = _parse(outs[1])
    ls, es = _parse(outs[2])
    assert l0 and ls and e0 and es
    # both processes observe the same replicated loss and metrics
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(e0, e1, rtol=1e-6)
    # 2-process x 4-device == 1-process x 8-device, step for step
    np.testing.assert_allclose(l0, ls, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(e0, es, rtol=1e-5, atol=1e-6)


# --------------------------------------------------- device-cache x 2-proc
# VERDICT r4 #4: the production loader (device-resident HBM cache) under a
# multi-host mesh — per-host staging via make_array_from_process_local_data
# into 'data'-row-sharded global blocks, a shared global epoch permutation,
# and fully on-device evaluation. Must match the single-process mesh run
# step for step and metric for metric.

CACHE_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from fuxictr_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize() == %(multi)s
    assert jax.device_count() == 8, jax.device_count()

    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.parallel import make_mesh
    from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map
    import pandas as pd

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=2,
                                    vocab_size=64, embedding_dim=4)
    fm.group_id = "C1"
    # deliberately NOT a multiple of batch_size=64: the eval kernel's
    # global row bound must -1 the tail-padding rows (idx 500..511), not
    # clip them into the last host's range (round-5 review finding)
    n = 500
    rng = np.random.default_rng(0)
    df = pd.DataFrame({name: (rng.integers(1, 64, n)
                              if spec["type"] == "categorical"
                              else rng.normal(size=n).astype(np.float32))
                       for name, spec in fm.features.items()})
    df["label"] = rng.integers(0, 2, n).astype(np.float32)
    pq = "/tmp/dist_cache_%(tag)s.parquet"
    df.to_parquet(pq)

    m = DNN(fm, embedding_dim=4, hidden_units=(16,),
            model_root="/tmp/dist_cache_test_%(tag)s", batch_norm=False,
            steps_per_call=2)
    mesh = make_mesh(n_data=4, n_model=2)
    m.distribute(mesh)        # born-sharded init

    loader = DeviceCacheDataLoader(
        fm, pq, batch_size=64, shuffle=True, seed=2019, mesh=mesh,
        device_shuffle=False,           # numpy stream == multihost stream
        host_id=jax.process_index(), num_hosts=jax.process_count())
    if %(multi)s:
        assert loader._multihost
        # no process stages more than its slice: the global int block is
        # row-sharded, each addressable shard holds n/8 rows
        blk = loader.cache_refs()["__cache_int__"]
        assert blk.shape[0] == 500
        # P("data") over n_data=4: each data-shard holds 500/4 = 125 rows
        # (replicated across the model axis); a process never sees rows
        # outside its own half
        for s in blk.addressable_shards:
            assert s.data.shape[0] == 125, s.data.shape
        rows_here = {int(s.index[0].start) for s in blk.addressable_shards}
        expect = {0, 125} if jax.process_index() == 0 else {250, 375}
        assert rows_here == expect, rows_here

    losses = []
    import logging
    class Grab(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if msg.startswith("Train loss:"):
                losses.append(float(msg.split()[2]))
    logging.getLogger().setLevel(logging.INFO)
    logging.getLogger().addHandler(Grab())
    m.fit(loader, validation_data=None, epochs=2)

    logs = m.evaluate(loader, metrics=["AUC", "logloss", "gAUC"])
    print("LOSSES", " ".join("%%.8f" %% l for l in losses))
    print("EVAL", "%%.8f %%.8f %%.8f" %% (logs["AUC"], logs["logloss"],
                                          logs["gAUC"]))

    # odd-split eval: 489 rows over 2 hosts forces BOTH padding flavors
    # (per-host tail rows on host 1 and global batch tail 492..511); the
    # device metrics must still equal the single-process value exactly
    pq2 = "/tmp/dist_cache2_%(tag)s.parquet"
    df.head(489).to_parquet(pq2)
    loader2 = DeviceCacheDataLoader(
        fm, pq2, batch_size=64, shuffle=False, mesh=mesh,
        host_id=jax.process_index(), num_hosts=jax.process_count())
    logs2 = m.evaluate(loader2, metrics=["AUC", "logloss", "gAUC"])
    print("EVAL2", "%%.8f %%.8f %%.8f" %% (logs2["AUC"], logs2["logloss"],
                                           logs2["gAUC"]))
""")


def _parse_eval2(out):
    for line in out.splitlines():
        if line.startswith("EVAL2"):
            return [float(x) for x in line.split()[1:]]
    return None


def _run_cache_worker(tag, multi, env_extra):
    env = dict(os.environ)
    env.update({
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4"
        if multi else "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
    })
    env.update(env_extra)
    return subprocess.Popen(
        [sys.executable, "-c", CACHE_WORKER % {"repo": REPO, "multi": multi,
                                               "tag": tag}],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def test_two_process_device_cache_matches_single_process():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    workers = [
        _run_cache_worker(f"cmp{i}", True, {
            "FUXICTR_COORDINATOR": coord,
            "FUXICTR_NUM_PROCESSES": "2",
            "FUXICTR_PROCESS_ID": str(i),
        }) for i in range(2)]
    single = _run_cache_worker("csp", False, {})

    outs = []
    for p in workers + [single]:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)

    l0, e0 = _parse(outs[0])
    l1, e1 = _parse(outs[1])
    ls, es = _parse(outs[2])
    assert l0 and ls and e0 and es
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(e0, e1, rtol=1e-6)
    # 2-process sharded cache == 1-process replicated cache, step for step
    np.testing.assert_allclose(l0, ls, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(e0, es, rtol=1e-5, atol=1e-6)
    # odd-split eval (per-host AND global padding active) still exact
    x0, x1, xs = (_parse_eval2(o) for o in outs)
    assert x0 and xs
    np.testing.assert_allclose(x0, x1, rtol=1e-6)
    np.testing.assert_allclose(x0, xs, rtol=1e-5, atol=1e-6)


# ----------------------------------------------- LongCTR cache x 2-proc
# Same contract for the LongCTR device-resident loader: interaction blocks
# row-shard over 'data' per process, the user-sequence/item side tables
# stay replicated (every process reads the full shared parquet), and the
# on-device join + eval run as one GSPMD program.

LONGCTR_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from fuxictr_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize() == %(multi)s
    assert jax.device_count() == 8, jax.device_count()

    from fuxictr_tpu.data.longctr_loader import LongCTRDeviceCacheLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.registry import MODEL_REGISTRY
    from fuxictr_tpu.parallel import make_mesh
    import fuxictr_tpu.models.zoo  # noqa: F401

    root = os.path.join(%(repo)r, "data", "tiny_longctr")
    fm = FeatureMap("tiny_longctr", root)
    fm.load(os.path.join(root, "feature_map.json"), {})

    model = MODEL_REGISTRY["SIM"](
        fm, model_id="SIM_dist_%(tag)s", embedding_dim=8, attention_dim=8,
        dnn_hidden_units=(16,), topk=3, short_seq_len=2, max_len=12,
        steps_per_call=2, batch_norm=False,
        model_root="/tmp/dist_longctr_%(tag)s")
    mesh = make_mesh(n_data=4, n_model=2)
    model.distribute(mesh)

    loader = LongCTRDeviceCacheLoader(
        fm, os.path.join(root, "train.parquet"), batch_size=16,
        shuffle=True, seed=2019, mesh=mesh, device_shuffle=False,
        user_info=os.path.join(root, "user_info.parquet"),
        item_info=os.path.join(root, "item_info.parquet"), max_len=12,
        host_id=jax.process_index(), num_hosts=jax.process_count())
    if %(multi)s:
        assert loader._multihost
        blk = loader.cache_refs()["__cache_int__"]
        assert blk.shape[0] == 96
        for s in blk.addressable_shards:
            assert s.data.shape[0] == 24, s.data.shape
        # side tables replicated: every shard holds the full array
        useq = loader.cache_refs()["__cache_useq__"]
        for s in useq.addressable_shards:
            assert s.data.shape == useq.shape

    losses = []
    import logging
    class Grab(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if msg.startswith("Train loss:"):
                losses.append(float(msg.split()[2]))
    logging.getLogger().setLevel(logging.INFO)
    logging.getLogger().addHandler(Grab())
    model.fit(loader, validation_data=None, epochs=2)

    logs = model.evaluate(loader, metrics=["AUC", "logloss"])
    print("LOSSES", " ".join("%%.8f" %% l for l in losses))
    print("EVAL", "%%.8f %%.8f" %% (logs["AUC"], logs["logloss"]))
""")


MTL_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import pandas as pd
    from fuxictr_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize() == %(multi)s
    assert jax.device_count() == 8, jax.device_count()

    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.models.zoo.multitask_zoo import MMoE
    from fuxictr_tpu.parallel import make_mesh
    from fuxictr_tpu.utils.synthetic import make_synthetic_feature_map

    fm = make_synthetic_feature_map(num_categorical=3, num_numeric=2,
                                    vocab_size=64, embedding_dim=4)
    fm.labels = ["click", "conversion"]
    n = 256
    rng = np.random.default_rng(0)
    df = pd.DataFrame({name: (rng.integers(1, 64, n)
                              if spec["type"] == "categorical"
                              else rng.normal(size=n).astype(np.float32))
                       for name, spec in fm.features.items()})
    df["click"] = rng.integers(0, 2, n).astype(np.float32)
    df["conversion"] = rng.integers(0, 2, n).astype(np.float32)
    pq = "/tmp/dist_mtl_%(tag)s.parquet"
    df.to_parquet(pq)

    m = MMoE(fm, model_id="MMoE_dist_%(tag)s", embedding_dim=4,
             num_tasks=2,
             task=["binary_classification", "binary_classification"],
             num_experts=3, expert_hidden_units=(8,),
             gate_hidden_units=(8,), tower_hidden_units=(8,),
             steps_per_call=2, model_root="/tmp/dist_mtl_%(tag)s")
    mesh = make_mesh(n_data=4, n_model=2)
    m.distribute(mesh)
    loader = DeviceCacheDataLoader(
        fm, pq, batch_size=32, shuffle=True, seed=2019, mesh=mesh,
        device_shuffle=False,
        host_id=jax.process_index(), num_hosts=jax.process_count())

    losses = []
    import logging
    class Grab(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if msg.startswith("Train loss:"):
                losses.append(float(msg.split()[2]))
    logging.getLogger().setLevel(logging.INFO)
    logging.getLogger().addHandler(Grab())
    m.fit(loader, validation_data=None, epochs=2)

    logs = m.evaluate(loader, metrics=["AUC", "logloss"])
    print("LOSSES", " ".join("%%.8f" %% l for l in losses))
    print("EVAL", "%%.8f %%.8f %%.8f" %% (logs["click_AUC"],
                                          logs["conversion_AUC"],
                                          logs["logloss"]))
""")


def test_two_process_multitask_cache_matches_single_process():
    """MMoE through the sharded multi-host cache: per-task device eval and
    losses match the single-process run exactly."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    def spawn(tag, multi, env_extra):
        env = dict(os.environ)
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4"
            if multi else "--xla_force_host_platform_device_count=8",
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
        })
        env.update(env_extra)
        return subprocess.Popen(
            [sys.executable, "-c",
             MTL_WORKER % {"repo": REPO, "multi": multi, "tag": tag}],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)

    workers = [
        spawn(f"mmp{i}", True, {
            "FUXICTR_COORDINATOR": coord,
            "FUXICTR_NUM_PROCESSES": "2",
            "FUXICTR_PROCESS_ID": str(i),
        }) for i in range(2)]
    single = spawn("msp", False, {})

    outs = []
    for p in workers + [single]:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)

    l0, e0 = _parse(outs[0])
    l1, e1 = _parse(outs[1])
    ls, es = _parse(outs[2])
    assert l0 and ls and e0 and es
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(e0, e1, rtol=1e-6)
    np.testing.assert_allclose(l0, ls, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(e0, es, rtol=1e-5, atol=1e-6)


def test_two_process_longctr_cache_matches_single_process():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    def spawn(tag, multi, env_extra):
        env = dict(os.environ)
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4"
            if multi else "--xla_force_host_platform_device_count=8",
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
        })
        env.update(env_extra)
        return subprocess.Popen(
            [sys.executable, "-c",
             LONGCTR_WORKER % {"repo": REPO, "multi": multi, "tag": tag}],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)

    workers = [
        spawn(f"lmp{i}", True, {
            "FUXICTR_COORDINATOR": coord,
            "FUXICTR_NUM_PROCESSES": "2",
            "FUXICTR_PROCESS_ID": str(i),
        }) for i in range(2)]
    single = spawn("lsp", False, {})

    outs = []
    for p in workers + [single]:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(out)

    l0, e0 = _parse(outs[0])
    l1, e1 = _parse(outs[1])
    ls, es = _parse(outs[2])
    assert l0 and ls and e0 and es
    np.testing.assert_allclose(l0, l1, rtol=1e-6)
    np.testing.assert_allclose(e0, e1, rtol=1e-6)
    np.testing.assert_allclose(l0, ls, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(e0, es, rtol=1e-5, atol=1e-6)
