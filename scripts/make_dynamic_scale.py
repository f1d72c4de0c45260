"""Generate a dataset with planted SEGMENT-CONDITIONAL structure for the
dynamic-weight family (PPNet/PEPNet, APG).

Users belong to one of 8 hidden segments; 4 low-vocab fields carry
per-segment categorical weight tables:

    logit = bias + sum_f w_main[f][C_f]
                 + sum_{f in SEG_FIELDS} w_seg[seg(u), f][C_f]

with w_seg drawn iid zero-mean PER SEGMENT, so the segment-averaged
effect of those fields is ~0: a model without segment information gets
nothing from them (the DNN_nouser floor), while a model that routes by
user id can realize the full table. The segment is NOT a feature — only
user_id is observable (~300 rows/user at default scale) — so the model
must discover 8 latent modes from the user-id embedding. That is the
dynamic-weight family's premise (PPNet gates MLP hidden units by
user-id embeddings, cf. /root/reference/model_zoo/PEPNet/src/PPNet.py);
a plain DNN must emulate the routing in shared weights. There is NO
per-user main effect, so raw user-id memorization carries no signal
beyond segment discovery.

A first version of this benchmark planted segment-conditional PAIRWISE
latent interactions (sign-flipped <u_f, u_g> terms); PPNet, DNN and the
no-user DNN all scored an identical 0.6825 test AUC vs a 0.765 Bayes
ceiling — MLP towers never learned the multiplicative latent structure
at 60 rows/user in 2 epochs, so the benchmark discriminated nothing.
Per-segment categorical tables are the learnable form of the same
premise (~4k rows per (segment, category) cell).

Output: train/valid/test csv (label,user_id,C1..C12) + per-split
true-logit npys for the Bayes ceiling (cf. scripts/make_criteo_scale.py).
"""

import argparse
import os
import time

import numpy as np

N_USERS = 20_000
N_SEGS = 8
VOCABS = [50_000, 20_000, 10_000, 5_000, 2_000, 1_000, 500, 200,
          100, 50, 20, 8]
SEG_FIELDS = [8, 9, 10, 11]   # vocab 100 / 50 / 20 / 8
SPLITS = {"train": 6_000_000, "valid": 750_000, "test": 750_000}
BIAS = -1.45
W_MAIN_STD = 0.18
W_SEG_STD = 0.55


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ctr_scale/dynamic_raw")
    ap.add_argument("--seed", type=int, default=2019)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n_users = max(64, int(N_USERS * min(1.0, args.scale * 4)))

    cdfs, w_main = [], []
    for V in VOCABS:
        p = 1.0 / np.power(np.arange(1, V + 1), 1.05)
        cdfs.append(np.cumsum(p / p.sum()))
        w_main.append(rng.normal(0.0, W_MAIN_STD, V).astype(np.float32))
    w_seg = {f: rng.normal(0.0, W_SEG_STD, (N_SEGS, VOCABS[f]))
             .astype(np.float32) for f in SEG_FIELDS}
    user_seg = rng.integers(0, N_SEGS, n_users)

    header = "label,user_id," + ",".join(
        f"C{i+1}" for i in range(len(VOCABS)))
    t0 = time.time()
    for split, n_split in SPLITS.items():
        n_split = int(n_split * args.scale)
        logit_parts, noseg_parts = [], []
        with open(os.path.join(args.out, f"{split}.csv"), "w",
                  buffering=1 << 22) as fd:
            fd.write(header + "\n")
            done = 0
            while done < n_split:
                n = min(args.chunk, n_split - done)
                users = rng.integers(0, n_users, n)
                segs = user_seg[users]
                cats = np.empty((n, len(VOCABS)), np.int64)
                for f in range(len(VOCABS)):
                    cats[:, f] = np.searchsorted(
                        cdfs[f], rng.random(n), side="right")
                noseg = np.full(n, BIAS, np.float32)
                for f in range(len(VOCABS)):
                    noseg += w_main[f][cats[:, f]]
                logit = noseg.copy()
                for f in SEG_FIELDS:
                    logit += w_seg[f][segs, cats[:, f]]
                y = (rng.random(n) < 1 / (1 + np.exp(-logit))
                     ).astype(np.int8)
                logit_parts.append(logit)
                noseg_parts.append(noseg)
                cat_s = [",".join(map(str, row)) for row in cats]
                fd.write("\n".join(
                    f"{int(yy)},{u + 1},{cs}" for yy, u, cs
                    in zip(y, users, cat_s)) + "\n")
                done += n
                print(f"[{split}] {done}/{n_split} "
                      f"({done / max(time.time() - t0, 1e-9):.0f} rows/s)",
                      flush=True)
        np.save(os.path.join(args.out, f"{split}_true_logit.npy"),
                np.concatenate(logit_parts))
        np.save(os.path.join(args.out, f"{split}_noseg_logit.npy"),
                np.concatenate(noseg_parts))
    print(f"done -> {args.out} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
