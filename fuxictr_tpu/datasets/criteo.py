"""Criteo customizations (parity: /root/reference/fuxictr/datasets/criteo.py:27-45)."""

import numpy as np

from fuxictr_tpu.preprocess import FeatureProcessor


class CustomizedFeatureProcessor(FeatureProcessor):
    def convert_to_bucket(self, df, col_name):
        """log²-bucket large numeric values: v>2 → floor(ln(v)²), else v."""
        v = df[col_name].astype(float).to_numpy()
        out = np.where(v > 2, np.floor(np.log(np.maximum(v, 1e-12)) ** 2), v)
        return np.nan_to_num(out, nan=0).astype(np.int32)
