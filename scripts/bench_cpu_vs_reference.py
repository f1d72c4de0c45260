"""Same-hardware software-efficiency comparison: fuxictr_tpu (JAX, CPU
backend) vs the reference FuxiCTR (PyTorch, CPU) training the SAME DCNv2
on the SAME artifacts, on the SAME host cores.

The dataset is built ONCE by fuxictr_tpu's offline pipeline and consumed
directly by the reference's ParquetDataLoader — exercising the
byte-compatible `feature_map.json` + parquet-parts contract for real.
This isolates the software stack (input path + train loop + compiled
step), not the accelerator: the TPU numbers live in BENCHMARKS.md; this
answers "is the framework itself efficient, or just the chip?".

Usage:
  python scripts/bench_cpu_vs_reference.py --phase gen      # ~500k rows
  python scripts/bench_cpu_vs_reference.py --phase build
  python scripts/bench_cpu_vs_reference.py --phase train --engine jax
  python scripts/bench_cpu_vs_reference.py --phase train --engine ref
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
RAW = os.environ.get("CPUBENCH_RAW", "/tmp/ctr_scale/cpubench_raw")
DATA = os.environ.get("CPUBENCH_DATA", "/tmp/ctr_scale/cpubench_data")
DATASET_ID = "criteo_full_syn"
SCALE = float(os.environ.get("CPUBENCH_SCALE", 0.015))

MODEL_PARAMS = dict(
    model_id="DCNv2_cpubench", embedding_dim=16, model_structure="parallel",
    num_cross_layers=3, stacked_dnn_hidden_units=[400, 400, 400],
    parallel_dnn_hidden_units=[400, 400, 400], learning_rate=1e-3,
    optimizer="adam", loss="binary_crossentropy", task="binary_classification",
    metrics=["AUC", "logloss"], monitor="AUC", verbose=1,
    net_regularizer=None, embedding_regularizer=None,
)
BATCH_SIZE = 4096
EPOCHS = 1


def phase_gen():
    subprocess.check_call([sys.executable,
                           os.path.join(HERE, "make_criteo_scale.py"),
                           "--out", RAW, "--scale", str(SCALE)])


def phase_build():
    env = dict(os.environ, CRITEO_RAW=RAW, CRITEO_DATA=DATA,
               JAX_PLATFORMS="cpu")
    subprocess.check_call([sys.executable,
                           os.path.join(HERE, "run_criteo_scale.py"),
                           "--phase", "build"], env=env)


def _data_paths():
    base = os.path.join(DATA, DATASET_ID)
    return (os.path.join(base, "feature_map.json"),
            os.path.join(base, "train"), os.path.join(base, "valid"),
            os.path.join(base, "test"))


def train_jax():
    # env alone cannot counter the axon sitecustomize (it force-updates
    # jax_platforms at interpreter start); pin the CPU backend explicitly
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    from fuxictr_tpu.config import set_logger
    from fuxictr_tpu.data import RankDataLoader
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models import get_model, seed_everything

    fm_json, train_p, valid_p, test_p = _data_paths()
    params = dict(MODEL_PARAMS, dataset_id=DATASET_ID,
                  data_root=DATA + "/", model_root="/tmp/cpubench_ckpt/",
                  data_format="parquet", batch_size=BATCH_SIZE, shuffle=True,
                  device_cache=True, steps_per_call=16,
                  train_data=train_p, valid_data=valid_p, test_data=test_p,
                  epochs=EPOCHS)
    set_logger(params)
    seed_everything(2019)
    fm = FeatureMap(DATASET_ID, os.path.dirname(fm_json))
    fm.load(fm_json, params)
    model = get_model("DCNv2")(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", **params).make_iterator()
    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=EPOCHS)
    cold = time.time() - t0
    # steady state: second epoch reuses the compiled step (no XLA compile)
    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=EPOCHS)
    warm = time.time() - t0
    test_gen = RankDataLoader(fm, stage="test", **params).make_iterator()
    logs = model.evaluate(test_gen)
    print(json.dumps({
        "engine": "fuxictr_tpu(jax-cpu)", "fit_seconds_cold": round(cold, 1),
        "fit_seconds_warm": round(warm, 1),
        "examples_per_s_cold": round(train_gen.num_samples * EPOCHS / cold),
        "examples_per_s_warm": round(train_gen.num_samples * EPOCHS / warm),
        "test_AUC": round(float(logs["AUC"]), 6),
        "test_logloss": round(float(logs["logloss"]), 6)}), flush=True)


def train_ref():
    # polars/keras_preprocessing are not installed; the reference imports
    # them at module scope. The parity-test stubs satisfy the imports (the
    # in-memory ParquetDataLoader path used here never calls them).
    sys.path.insert(0, os.path.join(REPO, "tests", "_ref_stubs"))
    sys.path.insert(0, "/root/reference")
    import torch
    torch.set_num_threads(os.cpu_count())
    from fuxictr.features import FeatureMap
    from fuxictr.pytorch.dataloaders import RankDataLoader
    from fuxictr.pytorch.torch_utils import seed_everything
    from fuxictr.utils import set_logger
    sys.path.insert(0, "/root/reference/model_zoo/DCNv2")
    from src import DCNv2

    fm_json, train_p, valid_p, test_p = _data_paths()
    # the reference's in-memory ParquetDataLoader takes a single .parquet
    # file; this build is one part per split (data_block_size > rows)
    import glob as _glob
    train_p, valid_p, test_p = (
        _glob.glob(os.path.join(p, "*.parquet"))[0]
        for p in (train_p, valid_p, test_p))
    params = dict(MODEL_PARAMS, dataset_id=DATASET_ID, gpu=-1,
                  model_root="/tmp/cpubench_ckpt_ref/",
                  data_format="parquet", batch_size=BATCH_SIZE,
                  shuffle=True, epochs=EPOCHS)
    set_logger(params)
    seed_everything(2019)
    fm = FeatureMap(DATASET_ID, os.path.dirname(fm_json))
    fm.load(fm_json, params)
    model = DCNv2(fm, **params)
    train_gen, valid_gen = RankDataLoader(
        fm, stage="train", train_data=train_p, valid_data=valid_p,
        batch_size=BATCH_SIZE, shuffle=True, streaming=False,
        data_format="parquet").make_iterator()
    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=EPOCHS)
    cold = time.time() - t0
    t0 = time.time()
    model.fit(train_gen, validation_data=valid_gen, epochs=EPOCHS)
    warm = time.time() - t0
    test_gen = RankDataLoader(
        fm, stage="test", test_data=test_p, batch_size=BATCH_SIZE,
        shuffle=False, streaming=False,
        data_format="parquet").make_iterator()
    logs = model.evaluate(test_gen)
    print(json.dumps({
        "engine": "reference(torch-cpu)", "fit_seconds_cold": round(cold, 1),
        "fit_seconds_warm": round(warm, 1),
        "examples_per_s_cold": round(train_gen.num_samples * EPOCHS / cold),
        "examples_per_s_warm": round(train_gen.num_samples * EPOCHS / warm),
        "test_AUC": round(float(logs["AUC"]), 6),
        "test_logloss": round(float(logs["logloss"]), 6)}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="train",
                    choices=["gen", "build", "train"])
    ap.add_argument("--engine", default="jax", choices=["jax", "ref"])
    args = ap.parse_args()
    if args.phase == "gen":
        phase_gen()
    elif args.phase == "build":
        phase_build()
    elif args.engine == "jax":
        train_jax()
    else:
        train_ref()
