"""Generate a full-Avazu-scale synthetic CTR dataset with a planted
ground-truth model (BASELINE.md north-star trio: Criteo / Avazu / Amazon).

Real Avazu is unobtainable in this environment (zero egress), so the
benchmark uses a 40.43M-row workload with the Avazu schema — a YYMMDDHH
``hour`` column over 10 consecutive days plus 21 categorical fields with
Avazu-like vocab shapes (two huge device fields, several mid, many tiny) —
and a KNOWN Bayes-optimal classifier:

    true_logit = bias + sum_f w_f[C_f] + diurnal[hour_of_day]
                 + dow[weekday] + w_we * is_weekend
                 + sum_(f,g in PAIRS) <u_f[C_f], u_g[C_g]>

The time effects are carried ONLY by the ``hour`` column, so the
reference-parity avazu customizer (fuxictr_tpu/datasets/avazu.py,
cf. /root/reference/fuxictr/datasets/avazu.py:26-70) must derive
weekday / weekend / hour-of-day for a model to reach the ceiling — the
benchmark exercises the custom ``preprocess:`` path end to end. Per-row
``true_logit`` is saved separately so the planted Bayes AUC is measurable
on the same eval rows (cf. scripts/make_criteo_scale.py).

Rows are time-ordered; splits are sequential (train=first 7 days' worth),
mirroring Avazu's temporal structure. Split sizes follow the BARS
avazu_x1 7:1:2 proportions of 40,428,967 rows.
"""

import argparse
import os
import time

import numpy as np

# Avazu-like vocab sizes (device_id/device_ip scaled to keep the planted
# latent tables in host RAM; they remain the two dominant-vocab fields).
RAW_CATS = [
    ("C1", 7), ("banner_pos", 7), ("site_id", 4700),
    ("site_domain", 7700), ("site_category", 26), ("app_id", 8500),
    ("app_domain", 560), ("app_category", 36), ("device_id", 300000),
    ("device_ip", 800000), ("device_model", 8300), ("device_type", 5),
    ("device_conn_type", 4), ("C14", 2600), ("C15", 8), ("C16", 9),
    ("C17", 435), ("C18", 4), ("C19", 68), ("C20", 172), ("C21", 60),
]
EMB_K = 4
# field-index pairs (into RAW_CATS) carrying pairwise latent interactions
PAIRS = [(2, 5), (3, 10), (13, 16), (1, 4), (8, 7)]
SPLITS = {"train": 28_300_276, "valid": 4_042_896, "test": 8_085_794}
N_HOURS = 240                        # 10 days, 141021..141030
DAY0 = np.datetime64("2014-10-21")


def _field_tables(rng):
    cdfs, w_main, u_lat = [], [], {}
    for f, (_, V) in enumerate(RAW_CATS):
        p = 1.0 / np.power(np.arange(1, V + 1), 1.05)
        p /= p.sum()
        cdfs.append(np.cumsum(p))
        w_main.append(rng.normal(0.0, 0.26, V).astype(np.float32))
    for f, g in PAIRS:
        for idx in (f, g):
            if idx not in u_lat:
                V = RAW_CATS[idx][1]
                u_lat[idx] = rng.normal(0.0, 0.30, (V, EMB_K)).astype(
                    np.float32)
    # smooth diurnal curve + per-hour jitter; weekday/weekend effects
    hod = np.arange(24)
    diurnal = (0.35 * np.sin(2 * np.pi * (hod - 9) / 24)
               + rng.normal(0.0, 0.12, 24)).astype(np.float32)
    dow_eff = rng.normal(0.0, 0.10, 7).astype(np.float32)
    w_weekend = np.float32(-0.18)
    return cdfs, w_main, u_lat, diurnal, dow_eff, w_weekend


def _hour_strings():
    """YYMMDDHH strings for the 240 hour slots."""
    out = []
    for h in range(N_HOURS):
        d = DAY0 + np.timedelta64(h // 24, "D")
        ymd = str(d).replace("-", "")[2:]          # YYMMDD
        out.append(f"{ymd}{h % 24:02d}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ctr_scale/avazu_raw")
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--seed", type=int, default=2019)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="fraction of the full 40.43M rows")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    cdfs, w_main, u_lat, diurnal, dow_eff, w_weekend = _field_tables(rng)
    bias = -1.90                      # -> CTR ~ 17%, Avazu-like
    hour_str = _hour_strings()
    hour_dow = np.array([(int((DAY0 + np.timedelta64(h // 24, "D"))
                               .astype("datetime64[D]").astype(int) + 4) + 1)
                         % 7 for h in range(N_HOURS)])
    # numpy epoch day 0 = Thursday(3); reference maps Mon..Sun -> 1..6,0
    hour_is_we = np.array([
        ((DAY0 + np.timedelta64(h // 24, "D")).astype(int) + 3) % 7 >= 5
        for h in range(N_HOURS)], dtype=np.int8)

    n_total = int(sum(SPLITS.values()) * args.scale)
    rows_per_hour = max(1, n_total // N_HOURS)

    header = "click,hour," + ",".join(name for name, _ in RAW_CATS)
    t0 = time.time()
    row_global = 0
    for split, n_split in SPLITS.items():
        n_split = int(n_split * args.scale)
        path = os.path.join(args.out, f"{split}.csv")
        logit_parts = []
        with open(path, "w", buffering=1 << 22) as fd:
            fd.write(header + "\n")
            done = 0
            while done < n_split:
                n = min(args.chunk, n_split - done)
                hidx = np.minimum(
                    (row_global + np.arange(n)) // rows_per_hour,
                    N_HOURS - 1)
                cats = np.empty((n, len(RAW_CATS)), np.int64)
                for f in range(len(RAW_CATS)):
                    cats[:, f] = np.searchsorted(
                        cdfs[f], rng.random(n), side="right")
                logit = np.full(n, bias, np.float32)
                for f in range(len(RAW_CATS)):
                    logit += w_main[f][cats[:, f]]
                logit += diurnal[hidx % 24]
                logit += dow_eff[hour_dow[hidx]]
                logit += w_weekend * hour_is_we[hidx]
                for f, g in PAIRS:
                    logit += np.einsum("nk,nk->n", u_lat[f][cats[:, f]],
                                       u_lat[g][cats[:, g]])
                y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))
                     ).astype(np.int8)
                logit_parts.append(logit)
                hs = [hour_str[h] for h in hidx]
                cat_s = [",".join(map(str, row)) for row in cats]
                fd.write("\n".join(
                    f"{int(yy)},{h},{cs}" for yy, h, cs
                    in zip(y, hs, cat_s)) + "\n")
                done += n
                row_global += n
                print(f"[{split}] {done}/{n_split} rows "
                      f"({row_global / (time.time() - t0):.0f} rows/s)",
                      flush=True)
        np.save(os.path.join(args.out, f"{split}_true_logit.npy"),
                np.concatenate(logit_parts))
    print(f"done: {row_global} rows in {time.time() - t0:.0f}s "
          f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
