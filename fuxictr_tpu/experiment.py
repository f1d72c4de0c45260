"""End-to-end experiment driver.

Equivalent of the reference's uniform run_expid flow
(model_zoo/*/run_expid.py:37-87): load config → (build dataset if csv) →
FeatureMap → model → fit → evaluate valid/test → append result CSV row.
"""

import gc
import logging
import os
from datetime import datetime

from fuxictr_tpu.config import (load_config, print_to_json, print_to_list,
                                set_logger)
from fuxictr_tpu.data import RankDataLoader
from fuxictr_tpu.features import FeatureMap
from fuxictr_tpu.models import get_model, seed_everything


_LOADER_KEYS = (
    "dataset_id", "data_root", "train_data", "valid_data", "test_data",
    "batch_size", "data_format", "streaming", "device_cache", "shuffle",
    "seed", "host_id", "num_hosts", "hbm_limit_gb", "data_loader",
    "max_len", "group_id", "data_block_size", "device_shuffle",
    "narrow_staging", "float_staging", "dedup_items", "dedup_min_bucket",
    "user_info", "item_info", "buffer_size", "use_features")

# at most this many loader sets stay alive per stage in warm-tuner mode —
# a device-cache loader pins a multi-GB HBM block, so an unbounded cache
# over e.g. a batch_size grid would OOM the chip by the third expid
_LOADER_CACHE_KEEP = 2


def _get_loaders(stage, feature_map, params, shared):
    """Build (or, in warm-tuner mode, reuse) the stage's data loaders.

    ``shared`` is the warm autotuner's cross-expid cache: expids that agree
    on EVERY loader-relevant param (_LOADER_KEYS) reuse the already-staged
    loaders (e.g. the device-resident HBM cache of 33M Criteo rows)
    instead of re-reading and re-staging per experiment. Reused loaders
    get their epoch counter reset so each expid sees the exact shuffle
    stream a fresh run would. Oldest entries are evicted beyond
    ``_LOADER_CACHE_KEEP`` per stage (dropping the reference frees the
    HBM blocks)."""
    if shared is None:
        return RankDataLoader(feature_map, stage=stage,
                              **params).make_iterator()
    from collections import OrderedDict
    cache = shared.setdefault("loaders", OrderedDict())
    key = (stage,) + tuple(repr(params.get(k)) for k in _LOADER_KEYS)
    if key in cache:
        cache.move_to_end(key)
    else:
        cache[key] = RankDataLoader(feature_map, stage=stage,
                                    **params).make_iterator()
        stale = [k for k in cache if k[0] == stage][:-_LOADER_CACHE_KEEP]
        for k in stale:
            del cache[k]
    out = cache[key]
    for loader in (out if isinstance(out, tuple) else (out,)):
        if hasattr(loader, "_epoch"):
            loader._epoch = 0
    return out


def run_expid(config_dir, experiment_id, result_file=None, params=None,
              shared=None):
    """Run one experiment; returns {'valid': logs, 'test': logs}.

    ``shared``: warm-tuner state dict (see :func:`_get_loaders`); pass the
    same dict across calls to reuse staged loaders between expids."""
    if params is None:
        params = load_config(config_dir, experiment_id)
    set_logger(params)
    logging.info("Params: " + print_to_json(params))
    seed_everything(params.get("seed", 2019))

    # multi-host: join the JAX runtime (no-op unless a coordinator is
    # configured via params or FUXICTR_* env) and shard input per process;
    # batch_size then counts PER-PROCESS rows
    from fuxictr_tpu.parallel.distributed import maybe_initialize
    distributed = maybe_initialize(params)
    if distributed:
        import jax
        params.setdefault("host_id", jax.process_index())
        params.setdefault("num_hosts", jax.process_count())

    data_dir = os.path.join(params["data_root"], params["dataset_id"])
    feature_map_json = os.path.join(data_dir, "feature_map.json")
    if params.get("data_format") == "csv":
        from fuxictr_tpu.preprocess import FeatureProcessor, build_dataset
        fp = FeatureProcessor(**params)
        params["train_data"], params["valid_data"], params["test_data"] = \
            build_dataset(fp, **params)
    feature_map = FeatureMap(params["dataset_id"], data_dir)
    feature_map.load(feature_map_json, params)
    logging.info("Feature specs: " + print_to_json(feature_map.features))

    model_cls = get_model(params["model"])
    model = model_cls(feature_map, **params)

    # LongCTR models need the side-table loader (reference injects it via
    # params["data_loader"], model_zoo/LongCTR/run_expid.py:68-69)
    if getattr(model_cls, "_longctr", False) and "data_loader" not in params:
        from fuxictr_tpu.data.longctr_loader import LongCTRDataLoader
        params["data_loader"] = LongCTRDataLoader

    if distributed or params.get("use_mesh"):
        from fuxictr_tpu.parallel import make_mesh
        mesh = make_mesh(n_model=int(params.get("mesh_model_axis", 1)))
        model.distribute(mesh)
        # device-cache loaders must place their HBM blocks ON this mesh
        # (loader.mesh is model.mesh gates the device-epoch path). On
        # multi-host runs each process stages its local row slice into
        # 'data'-row-sharded global blocks (data/device_cache.py
        # multi-host mode; exact-parity-tested in tests/test_distributed.py)
        if params.get("device_cache"):
            params.setdefault("mesh", mesh)
        shared = None    # mesh identity is per-expid: no loader reuse

    train_gen, valid_gen = _get_loaders("train", feature_map, params,
                                        shared)
    model.fit(train_gen, validation_data=valid_gen,
              epochs=params.get("epochs", 1))

    logging.info("****** Validation evaluation ******")
    valid_result = model.evaluate(valid_gen)

    test_result = {}
    if params.get("test_data"):
        logging.info("******** Test evaluation ********")
        test_gen = _get_loaders("test", feature_map, params, shared)
        test_result = model.evaluate(test_gen)

    if result_file:
        with open(result_file, "a+") as fd:
            fd.write(
                " {},[command] python run_expid.py,[exp_id] {},[dataset_id] {}"
                ",[train] N.A.,[val] {},[test] {}\n".format(
                    datetime.now().strftime("%Y%m%d-%H%M%S"),
                    experiment_id, params["dataset_id"],
                    print_to_list(valid_result), print_to_list(test_result)))
    if shared is None:
        del train_gen, valid_gen
        gc.collect()
    return {"valid": valid_result, "test": test_result, "model": model}


def main(argv=None):
    """Console entry point (``fuxictr_tpu-run``) — same CLI surface as the
    reference's experiment/run_expid.py:36-49 (--gpu accepted for parity;
    devices come from JAX)."""
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="./configs/tiny")
    parser.add_argument("--expid", type=str, default="DeepFM_test")
    parser.add_argument("--gpu", type=int, default=-1)
    args = parser.parse_args(argv)
    result_file = os.path.join(
        os.path.abspath(args.config),
        os.path.basename(os.path.normpath(args.config)) + ".csv")
    run_expid(args.config, args.expid, result_file=result_file)
