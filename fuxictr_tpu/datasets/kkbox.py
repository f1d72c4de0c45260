"""KKBox customizations (parity: /root/reference/fuxictr/datasets/kkbox.py:28-57)."""

import numpy as np
import pandas as pd

from fuxictr_tpu.preprocess import FeatureProcessor

_AGE_BOUNDS = [10, 20, 30, 40, 50, 60]


class CustomizedFeatureProcessor(FeatureProcessor):
    def extract_country_code(self, df, col_name):
        """First two ISRC letters (registrant country)."""
        return df[col_name].fillna("").astype(str).str[:2]

    def bucketize_age(self, df, col_name):
        """Seven age buckets as strings; out-of-range/null → ''."""
        age = pd.to_numeric(df[col_name], errors="coerce")
        valid = age.between(1, 95)
        bucket = np.digitize(age.fillna(0).to_numpy(), _AGE_BOUNDS,
                             right=True) + 1
        return pd.Series(np.where(valid, bucket.astype(str), ""),
                         index=df.index)
