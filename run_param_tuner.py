#!/usr/bin/env python
"""Grid-search driver (parity: reference experiment/run_param_tuner.py:23-39)."""

import argparse

from fuxictr_tpu import autotuner

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="tuner config yaml")
    parser.add_argument("--tag", type=str, default=None,
                        help="expid substring filter")
    parser.add_argument("--slots", nargs="+", default=["0"],
                        help="device slots (TPU slices / worker indices)")
    args = parser.parse_args()
    config_dir = autotuner.enumerate_params(args.config)
    failed = autotuner.grid_search(config_dir, args.slots,
                                   expid_tag=args.tag)
    if failed:
        raise SystemExit(
            f"{len(failed)} expid(s) failed after retries: "
            + ", ".join(failed))
