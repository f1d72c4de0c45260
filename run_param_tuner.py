#!/usr/bin/env python
"""Grid-search driver (parity: reference experiment/run_param_tuner.py:23-39).

Adds ``--inprocess``: run every expid in THIS process, sharing the live
JAX runtime, staged data loaders, and the persistent compile cache —
measured 0.165× the subprocess scheduler's wall-clock on a TPU 8-expid
sweep (BENCHMARKS.md "Warm autotuner").
"""

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
    parser.add_argument("--inprocess", action="store_true",
                        help="warm single-runtime mode (shared loaders + "
                        "compile cache; subprocess mode isolates crashes)")
    args = parser.parse_args()
    config_dir = autotuner.enumerate_params(args.config)
    if args.inprocess:
        failed = autotuner.grid_search_inprocess(config_dir,
                                                 expid_tag=args.tag)
    else:
        failed = autotuner.grid_search(config_dir, args.slots,
                                       expid_tag=args.tag)
    if failed:
        raise SystemExit(
            f"{len(failed)} expid(s) failed after retries: "
            + ", ".join(failed))
