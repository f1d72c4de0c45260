"""Isolate DeepFM's step-cost anomaly: at full-Criteo shapes DeepFM
measured ~80k ex/s while WideDeep (same LR + same MLP, no FM pairwise
term) measured ~414k. The pairwise term is 3 elementwise passes over
[B, F, D] — microscopic FLOPs — so something structural (fusion break /
double gather / layout) must be at fault. Times each variant's full train
step (fwd+bwd+adam, bf16 compute) on the chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from fuxictr_tpu.utils.synthetic import (make_synthetic_batch,
                                             make_synthetic_feature_map)

    B = int(os.environ.get("BENCH_BATCH", 8192))
    steps = int(os.environ.get("BENCH_STEPS", 30))
    fm = make_synthetic_feature_map(num_categorical=26, num_numeric=13,
                                    vocab_size=100000, embedding_dim=16)
    batch = make_synthetic_batch(fm, batch_size=B, seed=0)

    def timed(model, label):
        model.init_params()
        step = model._make_train_step()
        rng = jax.random.PRNGKey(0)
        batch_dev = jax.device_put(batch)
        state, loss = step(model.state, batch_dev, rng)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, loss = step(state, batch_dev, rng)
        float(loss)
        dt = time.perf_counter() - t0
        print(f"{label}: {dt / steps * 1000:.2f} ms/step "
              f"({steps * B / dt:,.0f} ex/s)", flush=True)

    from fuxictr_tpu.models.zoo.ranking import DNN, FM, DeepFM, WideDeep

    kw = dict(embedding_dim=16, compute_dtype="bfloat16",
              model_root="/tmp/fuxictr_tpu_bench")
    timed(DNN(fm, model_id="a_dnn", hidden_units=[1024, 512, 256], **kw),
          "DNN  (emb16 + MLP)")
    timed(WideDeep(fm, model_id="a_wd", hidden_units=[1024, 512, 256], **kw),
          "WideDeep (LR + MLP)")
    timed(FM(fm, model_id="a_fm", **kw),
          "FM   (LR + pairwise)")
    timed(DeepFM(fm, model_id="a_dfm", hidden_units=[1024, 512, 256], **kw),
          "DeepFM (LR + pairwise + MLP)")


if __name__ == "__main__":
    main()
