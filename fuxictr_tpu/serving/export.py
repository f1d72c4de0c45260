"""Model export: write a self-contained serving bundle.

Bundle layout (one directory):
    model_meta.json        {"model": <registry name>, "params": {...},
                            "fuxictr_tpu_version": "..."}
    feature_map.json       byte-identical to the training artifact
    weights.msgpack        flax-serialized {"params": ..., "model_state": ...}
    feature_processor.pkl  (optional) offline processor for online encoding
    feature_vocab.json     (optional) human-readable vocab
"""

import json
import os
import shutil

import flax

import fuxictr_tpu

# keys of the experiment params dict that matter for rebuilding the net;
# everything else (paths, loader knobs, optimizer state) is training-only.
_TRAINING_ONLY = {
    "train_data", "valid_data", "test_data", "data_root", "data_format",
    "model_root", "expid", "dataset_id", "gpu", "seed", "epochs", "shuffle",
    "batch_size", "eval_steps", "optimizer", "loss", "learning_rate",
    "metrics", "monitor", "monitor_mode", "early_stop_patience",
    "save_best_only", "reduce_lr_on_plateau", "streaming", "num_workers",
    "device_cache", "use_mesh", "mesh_model_axis", "steps_per_call",
    "hbm_limit_gb", "verbose", "debug_mode", "partition_block_size",
    "feature_cols", "label_col", "min_categr_count", "rng_impl",
}


def _jsonable(value):
    try:
        json.dumps(value)
        return True
    except TypeError:
        return False


def export_model(model, export_dir, params=None, include_processor=True,
                 quantize=None):
    """Write a serving bundle for a trained model.

    Args:
        model: a fitted RankModel/MultiTaskModel (state must exist).
        export_dir: output directory (created if missing).
        params: the experiment params dict; if None, ``model.kwargs`` plus
            the constructor defaults captured on the instance are used.
        include_processor: copy feature_processor.pkl / feature_vocab.json
            from the dataset dir when present, enabling online raw-feature
            encoding at serve time.
        quantize: "int8" stores the fused embedding tables quantized
            (per-row symmetric int8 + f32 scales, serving/quantize.py) —
            a ~4x smaller bundle that the Predictor loads directly. The
            alternative is a float bundle + ``Predictor(quantize="int8")``
            (quantizes at load).
    Returns the export_dir.
    """
    if model.state is None:
        raise ValueError("model has no state — fit or init_params first")
    os.makedirs(export_dir, exist_ok=True)

    fm = model.feature_map
    src_fm = os.path.join(fm.data_dir, "feature_map.json")
    if os.path.exists(src_fm):
        shutil.copy(src_fm, os.path.join(export_dir, "feature_map.json"))
    else:  # synthetic FeatureMap (tests/benchmarks): save it
        fm.save(os.path.join(export_dir, "feature_map.json"))

    if params is None:
        params = dict(model.kwargs)
        params["model"] = type(model).__name__
    clean = {k: v for k, v in params.items()
             if k not in _TRAINING_ONLY and _jsonable(v)}
    clean["model"] = params.get("model", type(model).__name__)
    # pin the EFFECTIVE table layout so the bundle stays loadable even if
    # the library's default size-bucket edges change in a later version
    # (param names/shapes depend on it — ops/embedding.py EmbeddingLayout)
    from fuxictr_tpu.ops.embedding import DEFAULT_TABLE_SIZE_BUCKETS
    effective = getattr(fm, "table_size_buckets", None)
    if effective is None:           # () / [] mean "explicitly disabled"
        effective = DEFAULT_TABLE_SIZE_BUCKETS
    clean.setdefault("table_size_buckets", list(effective))
    if quantize:
        if quantize != "int8":
            raise NotImplementedError(
                f"quantize={quantize} is not supported (int8 only)")
        clean["table_dtype"] = "int8"
    meta = {"model": clean["model"], "params": clean,
            "fuxictr_tpu_version": fuxictr_tpu.__version__,
            "dataset_id": fm.dataset_id,
            "labels": list(fm.labels)}
    with open(os.path.join(export_dir, "model_meta.json"), "w") as fd:
        json.dump(meta, fd, indent=2, sort_keys=True)

    import jax
    weights = jax.device_get({"params": model.state.params,
                              "model_state": model.state.model_state})
    if quantize:
        from fuxictr_tpu.serving.quantize import quantize_table_leaves
        weights["params"] = quantize_table_leaves(weights["params"])
    blob = flax.serialization.msgpack_serialize(weights)
    with open(os.path.join(export_dir, "weights.msgpack"), "wb") as fd:
        fd.write(blob)

    if include_processor:
        for artifact in ("feature_processor.pkl", "feature_vocab.json"):
            src = os.path.join(fm.data_dir, artifact)
            if os.path.exists(src):
                shutil.copy(src, os.path.join(export_dir, artifact))
    return export_dir
