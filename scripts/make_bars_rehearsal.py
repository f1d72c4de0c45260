"""Generate a raw-dialect Criteo file for the BARS runbook dress rehearsal.

VERDICT r4 #6: the egress-day path (`scripts/run_bars_criteo.py --phase
all`) had only been unit-tested at the parsing level; this script
manufactures a ~1M-row file in the EXACT display-challenge dialect —
headerless, TAB-separated, 40 cols = label + 13 integer I* + 26 hex-string
C*, with empty fields for missing values — so the full convert -> build ->
train pipeline can be rehearsed end-to-end on the chip before real data
ever arrives.

The label comes from a small planted logistic model (main effects +
pairwise latent interactions, as scripts/make_criteo_scale.py) so the
trained AUC is meaningfully above 0.5; hex tokens are stable per category
id, and missing-value rates mimic raw Criteo (~45%% of I*, ~10%% of C*
empty, varying per field).

Usage: python scripts/make_bars_rehearsal.py [--rows 1000000]
                                             [--out /tmp/ctr_scale/bars_raw]
"""

import argparse
import os
import time

import numpy as np

# scaled-down Criteo-like vocabs (1M rows can't exercise 1.2M-id fields)
VOCABS = [40000, 25000, 15000, 9000, 6000, 4000, 2600, 1800, 1200, 800,
          600, 400, 300, 220, 160, 110, 80, 60, 40, 28, 20, 14, 10, 8,
          6, 4]
EMB_K = 4
PAIRS = [(0, 1), (2, 4), (3, 7), (5, 10), (8, 14), (1, 6)]


def _hex_tokens(V, field, rng):
    """Stable 8-hex-char tokens per category id (raw-Criteo look)."""
    raw = rng.integers(0, 2 ** 32, V, dtype=np.uint64)
    return np.array([format((int(x) * 2654435761 + field) % 2 ** 32, "08x")
                     for x in raw])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/ctr_scale/bars_raw")
    ap.add_argument("--chunk", type=int, default=250_000)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    cdfs, w_main, u_lat, tokens = [], [], [], []
    for f, V in enumerate(VOCABS):
        p = 1.0 / np.power(np.arange(1, V + 1), 1.05)
        p /= p.sum()
        cdfs.append(np.cumsum(p))
        w_main.append(rng.normal(0.0, 0.30, V).astype(np.float32))
        u_lat.append(rng.normal(0.0, 0.32, (V, EMB_K)).astype(np.float32))
        tokens.append(_hex_tokens(V, f, rng))
    beta = rng.normal(0.0, 0.25, 13).astype(np.float32)
    miss_i = rng.uniform(0.2, 0.6, 13)      # per-field I* missing rates
    miss_c = rng.uniform(0.0, 0.2, 26)      # per-field C* missing rates
    bias = -1.9                             # ~25% positive rate

    t0 = time.time()
    path = os.path.join(args.out, "train.txt")
    n_done = 0
    pos = 0
    with open(path, "w") as fd:
        while n_done < args.rows:
            n = min(args.chunk, args.rows - n_done)
            cats = np.empty((n, 26), np.int64)
            for f in range(26):
                cats[:, f] = np.searchsorted(cdfs[f], rng.random(n),
                                             side="right")
            logit = np.full(n, bias, np.float32)
            for f in range(26):
                logit += w_main[f][cats[:, f]]
            # integer counts: lognormal-ish, correlated with the label
            # through beta on their log scale (the criteo customizer
            # buckets floor(log2(I)) — signal survives bucketing)
            ints = np.floor(np.exp(rng.normal(1.2, 1.4, (n, 13)))) \
                .astype(np.int64)
            logit += np.tanh(np.log1p(ints)).astype(np.float32) @ beta
            for f, g in PAIRS:
                logit += np.einsum("nk,nk->n", u_lat[f][cats[:, f]],
                                   u_lat[g][cats[:, g]])
            y = (rng.random(n) < 1.0 / (1.0 + np.exp(-logit))) \
                .astype(np.int8)
            pos += int(y.sum())

            cols = [y.astype(str)]
            for j in range(13):
                col = ints[:, j].astype(str).astype(object)
                col[rng.random(n) < miss_i[j]] = ""
                cols.append(col)
            for f in range(26):
                col = tokens[f][cats[:, f]].astype(object)
                col[rng.random(n) < miss_c[f]] = ""
                cols.append(col)
            block = np.stack(cols, axis=1)
            fd.write("\n".join("\t".join(row) for row in block) + "\n")
            n_done += n
            print(f"  {n_done}/{args.rows} rows "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print(f"wrote {path}: {n_done} rows, {pos / n_done:.4f} positive, "
          f"{os.path.getsize(path) / 2**20:.0f} MB in "
          f"{time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
