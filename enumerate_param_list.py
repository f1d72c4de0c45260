#!/usr/bin/env python
"""Expand a tuner config into per-expid YAMLs without running anything
(parity: reference experiment/enumerate_param_list.py:24-38). ``--exclude``
takes a results CSV and skips already-finished expids — the resume path
for an interrupted grid search."""

import argparse

from fuxictr_tpu import autotuner

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="tuner config yaml")
    parser.add_argument("--exclude", type=str, default="",
                        help="results csv of finished expids to skip")
    args = parser.parse_args()
    exclude_expid = []
    if args.exclude:
        import pandas as pd
        result_df = pd.read_csv(args.exclude, header=None)
        exclude_expid = result_df.iloc[:, 2].map(
            lambda x: x.replace("[exp_id] ", "").strip()).tolist()
    config_dir = autotuner.enumerate_params(args.config,
                                            exclude_expid=exclude_expid)
    for expid in autotuner.load_experiment_ids(config_dir):
        print(expid)
