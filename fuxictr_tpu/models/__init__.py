from fuxictr_tpu.models.base import RankModel, TrainState, seed_everything
from fuxictr_tpu.models.registry import MODEL_REGISTRY, get_model, register_model
