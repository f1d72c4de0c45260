"""Decompose full-Criteo DCNv2 training time: loader-only vs device-path
with pre-decoded cached batches vs full streaming path. Localizes the gap
between the 16.75 ms/step compiled-step microbench and the observed
~145 ms/batch sustained training."""
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

RAW = os.environ.get("CRITEO_RAW", "/tmp/ctr_scale/criteo_full_raw")
DATA_ROOT = os.environ.get("CRITEO_DATA", "/tmp/ctr_scale/criteo_full_data")
DATASET_ID = os.environ.get("CRITEO_DATASET_ID", "criteo_full_syn")
N_BATCHES = int(os.environ.get("N_BATCHES", "200"))
BS = int(os.environ.get("BS", "8192"))
K = int(os.environ.get("STEPS_PER_CALL", "10"))


def make_loader(fm, shuffle=True):
    from fuxictr_tpu.data import RankDataLoader
    gen, _ = RankDataLoader(
        fm, stage="train", batch_size=BS, shuffle=shuffle, streaming=True,
        data_format="parquet",
        train_data=f"{DATA_ROOT}/{DATASET_ID}/train/").make_iterator()
    return gen


def main():
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models import get_model, seed_everything
    seed_everything(2019)
    data_dir = os.path.join(DATA_ROOT, DATASET_ID)
    fm = FeatureMap(DATASET_ID, data_dir)
    fm.load(os.path.join(data_dir, "feature_map.json"),
            {"embedding_dim": 16})

    # -------- phase A: loader only
    it = iter(make_loader(fm))
    warm = [next(it) for _ in range(K)]   # warm prefetch + keep for phase B
    t0 = time.time()
    for _ in range(N_BATCHES):
        next(it)
    dt = time.time() - t0
    print(json.dumps({"phase": "A_loader_only",
                      "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
                      "examples_per_s": round(N_BATCHES * BS / dt)}),
          flush=True)

    # -------- build model
    model = get_model("DCNv2")(
        fm, model_id="prof", embedding_dim=16, model_structure="parallel",
        stacked_dnn_hidden_units=[1024, 512, 256],
        parallel_dnn_hidden_units=[1024, 512, 256],
        num_cross_layers=4, net_dropout=0.1, compute_dtype="bfloat16",
        steps_per_call=K, batch_size=BS,
        model_root="/tmp/ctr_scale/checkpoints/prof/")
    model.init_params()
    model._ensure_optimizer(10.0)
    model._jit_train_step = model._make_train_step()
    model._eval_steps = 10 ** 9
    model._total_steps = 0
    model._stop_training = False
    model._epoch_index = 0
    model.valid_gen = None

    class Feed:
        def __init__(self, batches):
            self.batches = batches

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

    # -------- phase B: device path, cached pre-decoded batches
    cached = list(itertools.islice(iter(make_loader(fm)), 50))
    model.train_epoch(Feed(cached[:K]))    # compile warmup
    import jax
    jax.block_until_ready(model.state.params)
    feed = Feed([cached[i % 50] for i in range(N_BATCHES)])
    t0 = time.time()
    model.train_epoch(feed)
    lv = float(np.asarray(model.state.step))  # true barrier: fetch a scalar
    dt = time.time() - t0
    print(json.dumps({"phase": "B_device_path_cached_batches",
                      "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
                      "examples_per_s": round(N_BATCHES * BS / dt),
                      "steps_done": lv}), flush=True)

    # -------- phase C: full streaming path
    stream = Feed(list(range(N_BATCHES)))   # len only
    stream.batches = None

    class StreamFeed:
        def __iter__(self):
            return itertools.islice(iter(make_loader(fm)), N_BATCHES)

        def __len__(self):
            return N_BATCHES

    t0 = time.time()
    model.train_epoch(StreamFeed())
    _ = float(np.asarray(model.state.step))
    dt = time.time() - t0
    print(json.dumps({"phase": "C_full_streaming_path",
                      "ms_per_batch": round(dt / N_BATCHES * 1e3, 2),
                      "examples_per_s": round(N_BATCHES * BS / dt)}),
          flush=True)


if __name__ == "__main__":
    main()
