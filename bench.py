"""Throughput benchmark: DCNv2 training step on a Criteo-shaped workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no in-repo throughput numbers (SURVEY.md §6), so
``vs_baseline`` compares against a measured torch-CPU-equivalent figure when
BASELINE.json provides one, else reports 1.0x per driver convention.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from fuxictr_tpu.models.zoo.ranking import DCNv2
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    batch_size = int(os.environ.get("BENCH_BATCH", 8192))
    vocab = int(os.environ.get("BENCH_VOCAB", 100000))
    emb_dim = int(os.environ.get("BENCH_EMB_DIM", 16))
    steps = int(os.environ.get("BENCH_STEPS", 50))

    fm = make_synthetic_feature_map(num_categorical=26, num_numeric=13,
                                    vocab_size=vocab, embedding_dim=emb_dim)
    model = DCNv2(fm, model_id="DCNv2_bench", embedding_dim=emb_dim,
                  model_structure="parallel",
                  stacked_dnn_hidden_units=[1024, 512, 256],
                  parallel_dnn_hidden_units=[1024, 512, 256],
                  num_cross_layers=4,
                  model_root="/tmp/fuxictr_tpu_bench")
    model.init_params()
    train_step = model._make_train_step()

    batch = make_synthetic_batch(fm, batch_size=batch_size, seed=0)
    batch = jax.device_put(batch)
    rng = jax.random.PRNGKey(0)

    # warmup / compile; NOTE: on the axon remote backend block_until_ready
    # returns after dispatch, so fetch the loss scalar as a true barrier
    state, loss = train_step(model.state, batch, rng)
    float(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = train_step(state, batch, rng)
    float(loss)   # scalar fetch waits for the full dependency chain
    dt = time.perf_counter() - t0

    examples_per_sec = steps * batch_size / dt
    baseline = None
    if os.path.exists("BASELINE.json"):
        try:
            with open("BASELINE.json") as fd:
                baseline = json.load(fd).get("published", {}).get(
                    "dcnv2_examples_per_sec")
        except Exception:
            baseline = None
    vs = examples_per_sec / baseline if baseline else 1.0
    print(json.dumps({"metric": "dcnv2_train_throughput",
                      "value": round(examples_per_sec, 1),
                      "unit": "examples/s",
                      "vs_baseline": round(vs, 3)}))


if __name__ == "__main__":
    main()
