"""Model registry: config ``model:`` strings → model classes.

Replaces the reference's per-model ``src/`` imports in run_expid drivers
(model_zoo/*/run_expid.py resolves ``getattr(src, params['model'])``); here
zoo modules self-register at import and :func:`get_model` imports the zoo
lazily on first lookup.
"""

import importlib

MODEL_REGISTRY = {}


def register_model(cls=None, name=None):
    def wrap(c):
        MODEL_REGISTRY[name or c.__name__] = c
        return c
    if cls is None:
        return wrap
    return wrap(cls)


def get_model(name):
    if not MODEL_REGISTRY:
        importlib.import_module("fuxictr_tpu.models.zoo")
    if name not in MODEL_REGISTRY:
        importlib.import_module("fuxictr_tpu.models.zoo")
    if name not in MODEL_REGISTRY:
        raise KeyError(f"model={name} is not registered. "
                       f"Available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
