"""Generate a full-Criteo-scale synthetic CTR dataset with a planted
ground-truth model.

Real Criteo is unobtainable in this environment (zero egress; nothing on
disk), so the round's "main event" benchmark uses a 45.84M-row workload
with the exact Criteo schema (label + I1..I13 numeric + C1..C26
categorical, Zipf-distributed ids over Criteo-like vocab sizes) and a
KNOWN Bayes-optimal classifier: the label is sampled from
``sigmoid(true_logit)`` where

    true_logit = bias + sum_f w_f[C_f] + sum_j beta_j * g(I_j)
                 + sum_(f,g in PAIRS) <u_f[C_f], u_g[C_g]>

The per-row ``true_logit`` is saved separately (never a feature), so the
Bayes AUC — the ceiling any model can reach — is measurable on the same
eval rows, and a trained model's AUC can be reported AGAINST that ceiling
(the honest substitute for BARS leaderboard parity; cf. BASELINE.md).

Split follows BARS criteo_x1: train 33.0M / valid 8.25M / test 4.58M.
"""

import argparse
import os
import time

import numpy as np

# Criteo-like vocab sizes: a few huge tail fields, many mid, some tiny.
VOCABS = [1200000, 550000, 300000, 180000, 90000, 60000, 40000, 25000,
          15000, 11000, 8000, 5500, 4000, 2600, 1800, 1200, 800, 500,
          300, 180, 110, 60, 35, 22, 14, 9]
assert len(VOCABS) == 26
EMB_K = 4                     # latent dim of planted pairwise interactions
PAIRS = [(0, 1), (2, 4), (3, 7), (5, 10), (8, 14), (1, 6)]
SPLITS = {"train": 33_003_326, "valid": 8_250_124, "test": 4_587_167}


def _field_tables(rng):
    """Per-field Zipf CDFs, main-effect weights, and latent vectors."""
    cdfs, w_main, u_lat = [], [], []
    for V in VOCABS:
        p = 1.0 / np.power(np.arange(1, V + 1), 1.05)
        p /= p.sum()
        cdfs.append(np.cumsum(p))
        w_main.append(rng.normal(0.0, 0.28, V).astype(np.float32))
        u_lat.append(rng.normal(0.0, 0.30, (V, EMB_K)).astype(np.float32))
    beta = rng.normal(0.0, 0.22, 13).astype(np.float32)
    return cdfs, w_main, u_lat, beta


def _gen_chunk(rng, n, cdfs, w_main, u_lat, beta, bias):
    cats = np.empty((n, 26), np.int64)
    for f in range(26):
        cats[:, f] = np.searchsorted(cdfs[f], rng.random(n), side="right")
    nums = rng.normal(0.0, 1.0, (n, 13)).astype(np.float32)
    logit = np.full(n, bias, np.float32)
    for f in range(26):
        logit += w_main[f][cats[:, f]]
    logit += np.tanh(nums) @ beta
    for f, g in PAIRS:
        logit += np.einsum("nk,nk->n", u_lat[f][cats[:, f]],
                           u_lat[g][cats[:, g]])
    y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))).astype(np.int8)
    return y, nums, cats, logit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ctr_scale/criteo_full_raw")
    ap.add_argument("--chunk", type=int, default=2_000_000)
    ap.add_argument("--seed", type=int, default=2019)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="fraction of the full 45.84M rows")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    cdfs, w_main, u_lat, beta = _field_tables(rng)
    bias = -1.45               # → CTR ~ 25%, Criteo-like

    header = "label," + ",".join(f"I{i+1}" for i in range(13)) + "," + \
        ",".join(f"C{i+1}" for i in range(26))
    t0 = time.time()
    total_rows = 0
    for split, n_split in SPLITS.items():
        n_split = int(n_split * args.scale)
        path = os.path.join(args.out, f"{split}.csv")
        logit_parts = []
        with open(path, "w", buffering=1 << 22) as fd:
            fd.write(header + "\n")
            done = 0
            while done < n_split:
                n = min(args.chunk, n_split - done)
                y, nums, cats, logit = _gen_chunk(
                    rng, n, cdfs, w_main, u_lat, beta, bias)
                logit_parts.append(logit)
                # fast CSV block write
                num_s = [",".join(f"{v:.5f}" for v in row) for row in nums]
                cat_s = [",".join(map(str, row)) for row in cats]
                fd.write("\n".join(
                    f"{int(yy)},{ns},{cs}" for yy, ns, cs
                    in zip(y, num_s, cat_s)) + "\n")
                done += n
                total_rows += n
                print(f"[{split}] {done}/{n_split} rows "
                      f"({total_rows / (time.time() - t0):.0f} rows/s)",
                      flush=True)
        np.save(os.path.join(args.out, f"{split}_true_logit.npy"),
                np.concatenate(logit_parts))
    print(f"done: {total_rows} rows in {time.time() - t0:.0f}s -> {args.out}")


if __name__ == "__main__":
    main()
