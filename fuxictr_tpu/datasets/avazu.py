"""Avazu customizations (parity: /root/reference/fuxictr/datasets/avazu.py:26-70)."""

import pandas as pd

from fuxictr_tpu.preprocess import FeatureProcessor


class CustomizedFeatureProcessor(FeatureProcessor):
    def convert_weekday(self, df, col_name=None):
        """Weekday (0-6, Monday=1..Sunday=0 mod 7) from YYMMDDHH `hour`."""
        dates = pd.to_datetime(df["hour"].astype(str).str[:6], format="%y%m%d")
        return ((dates.dt.weekday + 1) % 7).astype("int32")

    def convert_weekend(self, df, col_name=None):
        """1 for Sat/Sun, else 0."""
        dates = pd.to_datetime(df["hour"].astype(str).str[:6], format="%y%m%d")
        return dates.dt.weekday.isin([5, 6]).astype("int32")

    def convert_hour(self, df, col_name=None):
        """Hour-of-day (0-23) from YYMMDDHH `hour`."""
        return df["hour"].astype(str).str[6:8].astype("int32")
