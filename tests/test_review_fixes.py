"""Regression tests for round-2 review findings: multi-host streaming
batch-count alignment, cache-expander reset, compile()-between-fits,
empty ragged parts, and the device-cache/mesh mismatch guard."""

import numpy as np
import pytest

from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                         make_synthetic_feature_map)


def _write_parts(tmp_path, n_parts, rows):
    for p in range(n_parts):
        ids = np.arange(p * rows, (p + 1) * rows, dtype=np.int32) + 1
        np.savez(tmp_path / f"part_{p:05d}.npz", C1=ids,
                 label=np.zeros(rows, np.float32))


def test_streaming_multihost_equal_batch_counts(tmp_path):
    """With 3 parts over 2 hosts, both hosts must report AND yield the
    same batch count (jitted steps are collective — unequal counts would
    deadlock a multi-process run); padding batches carry mask 0 and no
    rows are lost or duplicated."""
    from fuxictr_tpu.data import BlockStreamingDataLoader
    fm = make_synthetic_feature_map(num_categorical=1, num_numeric=0,
                                    vocab_size=10000)
    _write_parts(tmp_path, n_parts=3, rows=100)
    loaders = [BlockStreamingDataLoader(fm, str(tmp_path), batch_size=32,
                                        shuffle=False, host_id=h,
                                        num_hosts=2) for h in range(2)]
    assert len(loaders[0]) == len(loaders[1])
    seen = []
    for loader in loaders:
        batches = list(loader)
        assert len(batches) == len(loader)
        for b in batches:
            seen.append(b["C1"][b[SAMPLE_MASK_KEY] > 0])
    np.testing.assert_array_equal(np.sort(np.concatenate(seen)),
                                  np.arange(300) + 1)
    # shuffled epochs must stay aligned too
    sh = [BlockStreamingDataLoader(fm, str(tmp_path), batch_size=32,
                                   shuffle=True, seed=5, host_id=h,
                                   num_hosts=2) for h in range(2)]
    assert len(list(sh[0])) == len(list(sh[1])) == len(sh[0])


def test_streaming_multihost_more_hosts_than_parts(tmp_path):
    """A host with NO local parts still yields the global batch count
    (all-padding batches) instead of raising or deadlocking."""
    from fuxictr_tpu.data import BlockStreamingDataLoader
    fm = make_synthetic_feature_map(num_categorical=1, num_numeric=0,
                                    vocab_size=10000)
    _write_parts(tmp_path, n_parts=1, rows=64)
    empty = BlockStreamingDataLoader(fm, str(tmp_path), batch_size=32,
                                     shuffle=False, host_id=1, num_hosts=2)
    full = BlockStreamingDataLoader(fm, str(tmp_path), batch_size=32,
                                    shuffle=False, host_id=0, num_hosts=2)
    assert len(empty) == len(full) == 2
    batches = list(empty)
    assert len(batches) == 2
    for b in batches:
        assert (b[SAMPLE_MASK_KEY] == 0).all()
        assert b["C1"].shape == (32,)


def test_cache_expander_resets_to_default(tmp_path):
    """Installing a loader WITHOUT a custom expander after one WITH must
    restore the default expansion (stale LongCTR expanders would feed the
    net raw cache batches)."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=1,
                                    vocab_size=64, embedding_dim=8)
    model = DNN(fm, model_id="DNN_expander", embedding_dim=8,
                hidden_units=[8], model_root=str(tmp_path))
    default = model._expand_batch

    class CustomLoader:
        cache_expander = staticmethod(lambda batch: batch)

    class PlainLoader:
        pass

    model._install_cache_expander(CustomLoader())
    assert model._expand_batch is CustomLoader.cache_expander
    model._install_cache_expander(PlainLoader())
    assert model._expand_batch is not CustomLoader.cache_expander
    assert model._expand_batch.func is default.func


def test_compile_between_fits_changes_live_lr_and_optimizer(tmp_path):
    """compile(lr=...) / compile(optimizer=...) after the state exists must
    take effect: the LR lives inside the optax opt_state (inject_hyperparams)
    and the opt-state structure depends on the optimizer."""
    from fuxictr_tpu.models.zoo.ranking import DNN
    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=1,
                                    vocab_size=64, embedding_dim=8)
    model = DNN(fm, model_id="DNN_compile", embedding_dim=8,
                hidden_units=[8], learning_rate=1e-3,
                model_root=str(tmp_path))
    model.init_params()
    nodes = model._find_hyperparam_nodes(model.state.opt_state)
    assert float(nodes[0].hyperparams["learning_rate"]) == pytest.approx(1e-3)
    model.compile(lr=5e-4)
    nodes = model._find_hyperparam_nodes(model.state.opt_state)
    assert float(nodes[0].hyperparams["learning_rate"]) == pytest.approx(5e-4)
    # optimizer swap re-inits opt_state with the new structure and still
    # trains (adam moments -> sgd trace-free state)
    model.compile(optimizer="sgd")
    import jax
    batch = make_synthetic_batch(fm, batch_size=8, seed=0)
    model.fit(iter_of(batch), epochs=1)
    assert np.isfinite(
        float(jax.device_get(model.state.step)) + 0.0)


def iter_of(batch):
    class L:
        num_samples = len(batch[SAMPLE_MASK_KEY])
        num_blocks = 1

        def __len__(self):
            return 1

        def __iter__(self):
            yield dict(batch)
    return L()


def test_empty_ragged_part_loads(tmp_path):
    """A zero-row part file with a list-typed sequence column must load as
    an empty array instead of crashing on lengths.max()."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from fuxictr_tpu.data.array_dataset import load_columns
    fm = make_synthetic_feature_map(num_categorical=1, num_numeric=0,
                                    vocab_size=100, num_sequence=1,
                                    seq_len=4)
    # ragged list column (unequal lengths would hit the fallback path),
    # then slice to zero rows
    table = pa.table({
        "C1": pa.array([], pa.int64()),
        "S1": pa.array([], pa.list_(pa.int64())),
        "label": pa.array([], pa.float32()),
    })
    path = tmp_path / "part_00000.parquet"
    pq.write_table(table, str(path))
    cols = load_columns(fm, str(path))
    assert cols["S1"].shape[0] == 0
    assert cols["C1"].shape == (0,)


def test_device_cache_without_model_mesh_raises(tmp_path):
    """A device-cache loader staged without the model's mesh cannot feed a
    mesh-sharded step — train_epoch must fail loudly, not silently
    re-stage per batch."""
    import jax
    from fuxictr_tpu.data.device_cache import DeviceCacheDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.parallel import make_mesh

    data_dir = "/root/repo/data/tiny_parquet"
    fm = FeatureMap("tiny_parquet", data_dir)
    fm.load(f"{data_dir}/feature_map.json", {"embedding_dim": 8})
    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
    model = DNN(fm, model_id="DNN_meshguard", embedding_dim=8,
                hidden_units=[8], batch_size=8,
                model_root=str(tmp_path))
    model.init_params()
    model.distribute(mesh)
    loader = DeviceCacheDataLoader(fm, f"{data_dir}/train.parquet",
                                   batch_size=8, mesh=None)
    with pytest.raises(ValueError, match="without the model's mesh"):
        model.fit(loader, epochs=1)


def test_longctr_device_iter_carries_labels(tmp_path):
    """LongCTRDeviceCacheLoader.__iter__ batches must include the host-side
    __labels__ (and group) entries the per-batch evaluate() path reads."""
    import pandas as pd
    from fuxictr_tpu.data.device_cache import LABELS_KEY
    from fuxictr_tpu.data.longctr_loader import LongCTRDeviceCacheLoader
    from fuxictr_tpu.features import FeatureMap

    fm = FeatureMap("longctr_labels", "")
    from collections import OrderedDict
    fm.features = OrderedDict([
        ("user_feat", {"source": "user", "type": "categorical",
                       "padding_idx": 0, "vocab_size": 8}),
        ("item_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": 32}),
    ])
    fm.labels = ["clk"]
    fm.num_fields = fm.get_num_fields()
    fm.default_emb_dim = 8
    fm.set_column_index()
    n = 10
    pd.DataFrame({
        "user_index": np.arange(n) % 3,
        "item_index": np.arange(n) % 5 + 1,
        "seq_len": np.full(n, 4),
        "user_feat": np.arange(n) % 7 + 1,
        "clk": (np.arange(n) % 2).astype(np.float32),
    }).to_parquet(tmp_path / "train.parquet")
    pd.DataFrame({
        "user_index": np.arange(3),
        "full_item_seq": [list(range(1, 6))] * 3,
    }).to_parquet(tmp_path / "user_info.parquet")
    pd.DataFrame({
        "item_index": np.arange(32),
        "item_id": np.arange(32),
    }).to_parquet(tmp_path / "item_info.parquet")
    loader = LongCTRDeviceCacheLoader(
        fm, str(tmp_path / "train.parquet"), batch_size=4, shuffle=False,
        user_info=str(tmp_path / "user_info.parquet"),
        item_info=str(tmp_path / "item_info.parquet"), max_len=4)
    got = []
    for b in loader:
        assert LABELS_KEY in b
        got.append(b[LABELS_KEY][b[SAMPLE_MASK_KEY] > 0, 0])
    np.testing.assert_array_equal(np.concatenate(got),
                                  (np.arange(n) % 2).astype(np.float32))


def test_rng_impl_knob_is_scoped_to_the_model():
    """rng_impl: 'rbg' gives the MODEL an rbg key lineage (BENCHMARKS.md
    round 3: ~5x cheaper dropout masks on TPU) WITHOUT mutating the
    process-global jax_default_prng_impl (round-3 advisor finding: the
    global flip silently switched every other model's random streams)."""
    import jax

    from fuxictr_tpu.models.zoo.ranking import DNN
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    fm = make_synthetic_feature_map(num_categorical=2, num_numeric=1,
                                    vocab_size=32, embedding_dim=4)
    before = jax.config.jax_default_prng_impl
    assert before == "threefry2x32"
    model = DNN(fm, model_id="rng_knob", embedding_dim=4,
                hidden_units=[8], net_dropout=0.1, rng_impl="rbg",
                model_root="/tmp/fuxictr_tpu_test")
    assert jax.config.jax_default_prng_impl == before   # untouched
    assert "rbg" in str(model._rng.dtype)               # scoped to model
    model.init_params()
    step = model._make_train_step()
    batch = make_synthetic_batch(fm, batch_size=8, seed=0)
    model._rng, step_rng = jax.random.split(model._rng)
    _, loss = step(model.state, model._place_batch(batch), step_rng)
    assert float(loss) == float(loss)   # finite
    assert jax.config.jax_default_prng_impl == before
