#!/usr/bin/env python
"""CLI experiment driver (parity with reference experiment/run_expid.py)."""

import argparse
import os

from fuxictr_tpu.experiment import run_expid

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="./configs/tiny",
                        help="config directory")
    parser.add_argument("--expid", type=str, default="DeepFM_test",
                        help="experiment id in model_config.yaml")
    parser.add_argument("--gpu", type=int, default=-1,
                        help="accepted for parity; devices come from JAX")
    args = parser.parse_args()
    result_file = os.path.join(
        os.path.abspath(args.config),
        os.path.basename(os.path.normpath(args.config)) + ".csv")
    run_expid(args.config, args.expid, result_file=result_file)
