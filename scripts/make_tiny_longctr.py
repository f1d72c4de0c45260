"""Generate the tiny_longctr smoke fixture (parquet side tables + schema).

Mirrors the layout the reference's LongCTR dataloader consumes
(/root/reference/model_zoo/LongCTR/longctr_dataloader.py:26-187): an
interaction file with (user_index, item_index, seq_len, ...), a per-user
``user_info.parquet`` holding full item sequences, and a per-item
``item_info.parquet`` with item features. Deterministic (seeded) so the
committed files are reproducible: ``python scripts/make_tiny_longctr.py``.
"""

import json
import os
import sys

import numpy as np
import pandas as pd

ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "tiny_longctr")
N_USERS, N_ITEMS, N_CATES = 30, 60, 8


def main():
    os.makedirs(ROOT, exist_ok=True)
    rng = np.random.default_rng(2026)
    user_seqs = [rng.integers(1, N_ITEMS, rng.integers(2, 40)).tolist()
                 for _ in range(N_USERS)]
    pd.DataFrame({"full_item_seq": user_seqs}).to_parquet(
        os.path.join(ROOT, "user_info.parquet"))
    pd.DataFrame({
        "item_index": np.arange(N_ITEMS),
        "item_id": np.arange(N_ITEMS),
        "cate_id": np.concatenate([[0], rng.integers(1, N_CATES,
                                                     N_ITEMS - 1)]),
    }).to_parquet(os.path.join(ROOT, "item_info.parquet"))

    def interactions(n, name):
        users = rng.integers(0, N_USERS, n)
        pd.DataFrame({
            "user_index": users,
            "seq_len": [min(len(user_seqs[u]), 40) for u in users],
            "item_index": rng.integers(1, N_ITEMS, n),
            "user_feat": rng.integers(1, 10, n),
            "clk": rng.integers(0, 2, n).astype(np.float32),
        }).to_parquet(os.path.join(ROOT, name))

    interactions(96, "train.parquet")
    interactions(32, "valid.parquet")
    interactions(32, "test.parquet")

    feature_map = {
        "dataset_id": "tiny_longctr",
        "num_fields": 3,
        "total_features": 78,
        "input_length": 0,
        "labels": ["clk"],
        "features": [
            {"user_feat": {"source": "user", "type": "categorical",
                           "padding_idx": 0, "vocab_size": 10}},
            {"item_id": {"source": "item", "type": "categorical",
                         "padding_idx": 0, "vocab_size": N_ITEMS}},
            {"cate_id": {"source": "item", "type": "categorical",
                         "padding_idx": 0, "vocab_size": N_CATES}},
        ],
    }
    with open(os.path.join(ROOT, "feature_map.json"), "w") as fd:
        json.dump(feature_map, fd, indent=4)
    print(f"wrote fixture to {ROOT}")


if __name__ == "__main__":
    sys.exit(main())
