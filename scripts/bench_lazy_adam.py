"""Measure lazy (touched-rows) adam vs dense adam on the LongCTR dedup
workload at production vocab — the ~12% lever estimated in round 1
(BENCHMARKS.md adam-vs-sgd delta). Uses the real SIM train step.

Usage: python scripts/bench_lazy_adam.py [dense|lazy] ...
"""

import sys
import time
from collections import OrderedDict

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

V = int(sys.argv[2]) if len(sys.argv) > 2 else 2_600_000
B, L, DIM = 1024, 256, 32
BUCKET = 8192
STEPS = 20


def build(lazy):
    from fuxictr_tpu.data.array_dataset import SAMPLE_MASK_KEY
    from fuxictr_tpu.data.longctr_loader import (INVERSE_KEY, ITEMS_KEY,
                                                 SEQ_MASK_KEY)
    from fuxictr_tpu.features import FeatureMap
    from fuxictr_tpu.models.zoo.longctr import SIM

    fm = FeatureMap("bench_lazy", "")
    fm.features = OrderedDict([
        ("user_feat", {"source": "user", "type": "categorical",
                       "padding_idx": 0, "vocab_size": 100_000}),
        ("item_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": V}),
        ("cate_id", {"source": "item", "type": "categorical",
                     "padding_idx": 0, "vocab_size": 5_000}),
    ])
    fm.labels = ["clk"]
    fm.num_fields = fm.get_num_fields()
    fm.default_emb_dim = DIM
    fm.set_column_index()

    rng = np.random.default_rng(0)
    # realistic batch-level item repetition: draws concentrate on an
    # active subset (user histories share items), like the round-1 bench
    active = rng.choice(np.arange(1, V), size=6000, replace=False)
    flat = active[rng.integers(0, len(active), B * (L + 1))]
    uniq, inv = np.unique(flat, return_inverse=True)
    assert len(uniq) <= BUCKET, len(uniq)
    ids = np.zeros(BUCKET, np.int64)
    ids[:len(uniq)] = uniq
    batch = {
        "user_feat": rng.integers(1, 100_000, B).astype(np.int64),
        SEQ_MASK_KEY: np.ones((B, L), np.float32),
        "clk": rng.integers(0, 2, B).astype(np.float32),
        SAMPLE_MASK_KEY: np.ones(B, np.float32),
        ITEMS_KEY: {"item_id": ids, "cate_id": (ids % 4999 + 1) * (ids > 0),
                    INVERSE_KEY: inv.astype(np.int32)},
    }
    model = SIM(fm, model_id=f"SIM_lazy{lazy}", embedding_dim=DIM,
                attention_dim=64, dnn_hidden_units=(512, 128),
                topk=50, short_seq_len=50, max_len=L,
                lazy_adam=lazy, compute_dtype="bfloat16",
                model_root="/tmp/bench_lazy")
    model._example_batch = lambda batch_size=2: batch
    model.init_params()
    return model, jax.device_put(batch)


def run(lazy):
    model, batch = build(lazy)
    step = model._make_train_step()
    state, loss = step(model.state, batch, jax.random.PRNGKey(0))
    float(loss)
    t0 = time.perf_counter()
    for s in range(STEPS):
        state, loss = step(state, batch, jax.random.PRNGKey(s))
    float(loss)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{'lazy' if lazy else 'dense'}@V={V}: {dt * 1e3:.2f} ms/step",
          flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("dense", "both"):
        run(False)
    if mode in ("lazy", "both"):
        run(True)
