from fuxictr_tpu.preprocess.build_dataset import (build_dataset,
                                                  split_train_test, transform)
from fuxictr_tpu.preprocess.feature_processor import FeatureProcessor
from fuxictr_tpu.preprocess.normalizer import Normalizer
from fuxictr_tpu.preprocess.tokenizer import Tokenizer

__all__ = ["FeatureProcessor", "Tokenizer", "Normalizer", "build_dataset",
           "split_train_test", "transform"]
