"""Isolate the device-cached epoch step cost: cache-block row count vs
dropout vs the plain resident-batch step (bench.py regime).

The production observation: DCNv2 full-Criteo (33M-row cache, 2.15M fused
vocab) runs ~94 ms/step while the synthetic resident-batch bench with the
SAME model shape runs ~18 ms/step. This isolates where the difference
lives (the [N,40] row gather scaling with N, dropout, or the scan
structure).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fuxictr_tpu.data.device_cache import (CACHE_FLOAT_KEY,
                                               CACHE_INT_KEY, cache_layout)
    from fuxictr_tpu.models.zoo.ranking import DCNv2
    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    B = int(os.environ.get("BENCH_BATCH", 8192))
    K = int(os.environ.get("BENCH_K", 32))
    vocab = int(os.environ.get("BENCH_VOCAB", 100000))
    steps = int(os.environ.get("BENCH_STEPS", 64))

    fm = make_synthetic_feature_map(num_categorical=26, num_numeric=13,
                                    vocab_size=vocab, embedding_dim=16)

    def build(dropout):
        m = DCNv2(fm, model_id="DCNv2_cachebench", embedding_dim=16,
                  model_structure="parallel",
                  stacked_dnn_hidden_units=[1024, 512, 256],
                  parallel_dnn_hidden_units=[1024, 512, 256],
                  num_cross_layers=4, net_dropout=dropout,
                  compute_dtype="bfloat16",
                  model_root="/tmp/fuxictr_tpu_bench")
        m.init_params()
        return m

    rng = np.random.default_rng(0)
    layout, wi, wf = cache_layout(fm)

    def run_cached(model, n_rows, label):
        blk_i = rng.integers(1, vocab, (n_rows, wi)).astype(np.int32)
        blk_f = rng.normal(size=(n_rows, wf)).astype(np.float32)
        cache = {CACHE_INT_KEY: jax.device_put(blk_i),
                 CACHE_FLOAT_KEY: jax.device_put(blk_f)}
        jax.block_until_ready(list(cache.values()))
        order = np.arange(n_rows, dtype=np.int32)
        rng.shuffle(order)
        need = ((steps * B + n_rows - 1) // n_rows + 1)
        order = np.concatenate([order] * need)
        order_dev = jax.device_put(order)
        runner = model._make_cached_epoch_step(B)
        key = jax.random.PRNGKey(0)
        state, loss = runner(model.state, cache, order_dev,
                             jnp.asarray(0, jnp.int32), key, K)
        float(loss)                       # true barrier
        n_calls = max(1, steps // K)
        t0 = time.perf_counter()
        for c in range(n_calls):
            state, loss = runner(state, cache, order_dev,
                                 jnp.asarray(c * K * B, jnp.int32), key, K)
        float(loss)
        dt = time.perf_counter() - t0
        ms = dt / (n_calls * K) * 1000
        print(f"{label}: {ms:.2f} ms/step ({n_calls * K * B / dt:,.0f} ex/s)",
              flush=True)
        model.state = state
        del cache, order_dev

    # reference regime: resident stacked batch (bench.py)
    model = build(0.0)
    batch = make_synthetic_batch(fm, batch_size=B, seed=0)
    stacked = jax.device_put(
        jax.tree_util.tree_map(lambda x: np.stack([x] * K), batch))
    multi = model._make_multi_step()
    key = jax.random.PRNGKey(0)
    state, loss = multi(model.state, stacked, key)
    float(loss)
    n_calls = max(1, steps // K)
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, loss = multi(state, stacked, key)
    float(loss)
    dt = time.perf_counter() - t0
    print(f"resident stacked batch (no dropout): "
          f"{dt / (n_calls * K) * 1000:.2f} ms/step", flush=True)

    model = build(0.0)
    run_cached(model, 2_000_000, "cached epoch, N=2M,  no dropout")
    model = build(0.0)
    run_cached(model, 33_000_000, "cached epoch, N=33M, no dropout")
    model = build(0.1)
    run_cached(model, 33_000_000, "cached epoch, N=33M, dropout 0.1")


if __name__ == "__main__":
    main()
