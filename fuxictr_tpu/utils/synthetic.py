"""Synthetic schema/batch generators for benchmarks and multi-chip dryruns.

Produces Criteo-shaped workloads (13 numeric + 26 categorical fields by
default) without touching disk, so compile checks and throughput benches are
self-contained.
"""

from collections import OrderedDict

import numpy as np

from fuxictr_tpu.features import FeatureMap


def make_synthetic_feature_map(dataset_id="synthetic",
                               num_categorical=26,
                               num_numeric=13,
                               vocab_size=10000,
                               num_sequence=0,
                               seq_len=20,
                               embedding_dim=16):
    """A FeatureMap resembling Criteo (or a behavior-sequence dataset)."""
    fm = FeatureMap(dataset_id, data_dir="")
    features = OrderedDict()
    # sources cycle user/item/context so source-aware models (DSSM, FLEN,
    # DLRM dense path) exercise their grouping logic on synthetic data
    sources = ("user", "item", "context")
    for i in range(num_numeric):
        features[f"I{i+1}"] = {"source": sources[i % 3], "type": "numeric"}
    vocabs = (list(vocab_size) if isinstance(vocab_size, (list, tuple))
              else [int(vocab_size)])
    for i in range(num_categorical):
        features[f"C{i+1}"] = {"source": sources[i % 3],
                               "type": "categorical",
                               "padding_idx": 0,
                               "vocab_size": int(vocabs[i % len(vocabs)])}
    for i in range(num_sequence):
        features[f"S{i+1}"] = {"source": "user", "type": "sequence",
                               "padding_idx": 0, "vocab_size": int(vocabs[0]),
                               "max_len": seq_len,
                               "share_embedding": "C1" if num_categorical else None}
        if not num_categorical:
            features[f"S{i+1}"].pop("share_embedding")
        else:
            features[f"S{i+1}"]["share_embedding"] = "C1"
    fm.features = features
    fm.labels = ["label"]
    fm.num_fields = fm.get_num_fields()
    fm.total_features = sum(s.get("vocab_size", 0) for s in features.values())
    fm.default_emb_dim = embedding_dim
    fm.set_column_index()
    return fm


def make_synthetic_batch(feature_map, batch_size=1024, seed=0):
    rng = np.random.default_rng(seed)
    batch = {}
    for name, spec in feature_map.features.items():
        t = spec["type"]
        if t == "numeric":
            batch[name] = rng.normal(size=(batch_size,)).astype(np.float32)
        elif t == "sequence":
            batch[name] = rng.integers(
                0, spec["vocab_size"], (batch_size, spec["max_len"]),
                dtype=np.int32)
        else:
            batch[name] = rng.integers(
                1, spec["vocab_size"], (batch_size,), dtype=np.int32)
    for label in feature_map.labels:
        batch[label] = rng.integers(0, 2, (batch_size,)).astype(np.float32)
    batch["__mask__"] = np.ones((batch_size,), np.float32)
    return batch
