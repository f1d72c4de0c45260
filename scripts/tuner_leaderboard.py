"""Render a tuner result CSV as a markdown leaderboard.

The warm tuner (fuxictr_tpu-tune --inprocess) appends one CSV row per
expid (same format as the reference's result lines). This script joins
those rows with each expid's generated YAML config to show WHICH
hyperparameters produced which test AUC, sorted best-first — the table
BENCHMARKS.md's "Autotuner at scale" section wants.

Usage: python scripts/tuner_leaderboard.py configs/tuner/tuner_criteo_full_dcnv2 [...]
"""

import os
import re
import sys

import yaml

ROW = re.compile(
    r"\[exp_id\] (\S+),\[dataset_id\] (\S+).*"
    r"\[val\] (.*?),\[test\] (.*)$")
METRIC = re.compile(r"(\w+[\w()=]*): ([0-9.]+)")

SHOW_KEYS = ("embedding_dim", "learning_rate", "net_dropout",
             "parallel_dnn_hidden_units", "dnn_hidden_units",
             "hidden_units", "cin_hidden_units", "batch_size")


def leaderboard(config_dir):
    csv_path = os.path.join(
        os.path.abspath(config_dir),
        os.path.basename(os.path.normpath(config_dir)) + ".csv")
    if not os.path.exists(csv_path):
        print(f"no results at {csv_path}")
        return []
    with open(os.path.join(config_dir, "model_config.yaml")) as fd:
        cfg = yaml.safe_load(fd)
    rows = []
    for line in open(csv_path):
        m = ROW.search(line)
        if not m:
            continue
        expid, _ds, val, test = m.groups()
        vals = dict(METRIC.findall(val))
        tests = dict(METRIC.findall(test))
        params = cfg.get(expid, {})
        rows.append({
            "expid": expid,
            **{k: params[k] for k in SHOW_KEYS if k in params},
            "valid_AUC": float(vals.get("AUC", 0)),
            "test_AUC": float(tests.get("AUC", 0)),
            "test_logloss": float(tests.get("logloss", 0)),
        })
    # keep the last result per expid (retries overwrite), best test AUC up
    dedup = {}
    for r in rows:
        dedup[r["expid"]] = r
    rows = sorted(dedup.values(), key=lambda r: -r["test_AUC"])
    if not rows:
        return rows
    keys = [k for k in ("expid",) + SHOW_KEYS
            + ("valid_AUC", "test_AUC", "test_logloss")
            if any(k in r for r in rows)]
    print("| " + " | ".join(keys) + " |")
    print("|" + "---|" * len(keys))
    for r in rows:
        print("| " + " | ".join(str(r.get(k, "")) for k in keys) + " |")
    return rows


if __name__ == "__main__":
    for d in (sys.argv[1:] or ["configs/tuner/tuner_criteo_full_dcnv2"]):
        print(f"\n## {d}")
        leaderboard(d)
