"""Production serving: model export bundles + a low-latency Predictor.

The reference has no serving story (training checkpoints are bare
``state_dict`` files, rank_model.py:417-423, consumable only by the same
training script). This subsystem is new TPU-first architecture:

- :func:`export_model` writes a self-contained bundle — weights,
  feature_map.json, the model config, and (optionally) the offline
  FeatureProcessor artifacts — so a server can reconstruct the exact
  model + feature encoding without the training configs.
- :class:`Predictor` loads a bundle and serves it with AOT-compiled
  predict functions at fixed batch buckets (static shapes — no retraces
  at serve time) and an online raw-features → encoded-ids path that is
  byte-identical to the offline pipeline (same Tokenizer/Normalizer).
- :class:`PredictionServer` (serving/server.py) exposes a Predictor over
  HTTP (stdlib-only): POST /predict with encoded or raw rows, /healthz,
  /info. CLI: ``python -m fuxictr_tpu.serving.server --bundle DIR``.
- ``serving/quantize.py``: opt-in int8 embedding-table quantization
  (per-row symmetric scales) at export or load time — ~4x smaller tables
  with measured-negligible AUC cost (BENCHMARKS.md round 3).
"""

from fuxictr_tpu.serving.export import export_model
from fuxictr_tpu.serving.predictor import Predictor
from fuxictr_tpu.serving.server import PredictionServer

__all__ = ["export_model", "Predictor", "PredictionServer"]
