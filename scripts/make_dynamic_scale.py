"""Generate a dataset with planted SEGMENT-CONDITIONAL interaction
structure for the dynamic-weight family (PPNet/PEPNet, APG).

Users belong to one of 8 hidden segments; the label's pairwise
interaction terms flip sign/activation BY SEGMENT over a fixed pool of
6 field pairs:

    logit = bias + sum_f w_f[C_f] + sum_p W[seg(u), p] * <u_fp, u_gp>

with W rows drawn from {-1, 0, +1} patterns. The segment is NOT a
feature — only user_id is observable — so a model must route examples
through 8 latent modes conditioned on the user id. That is the
dynamic-weight family's reason to exist (PPNet gates MLP hidden units by
user-id embeddings, cf. /root/reference/model_zoo/PEPNet/src/PPNet.py);
a history-free plain DNN must discover the modes in its shared weights.
There is NO per-user main effect, so raw user-id memorization carries no
signal beyond segment discovery.

Output: train/valid/test csv (label,user_id,C1..C12) + per-split
true-logit npys for the Bayes ceiling (cf. scripts/make_criteo_scale.py).
"""

import argparse
import os
import time

import numpy as np

N_USERS = 100_000
N_SEGS = 8
VOCABS = [50_000, 20_000, 10_000, 5_000, 2_000, 1_000, 500, 200,
          100, 50, 20, 8]
EMB_K = 6
PAIR_POOL = [(0, 1), (2, 3), (4, 5), (0, 6), (1, 7), (2, 8)]
SPLITS = {"train": 6_000_000, "valid": 750_000, "test": 750_000}
BIAS = -1.75


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ctr_scale/dynamic_raw")
    ap.add_argument("--seed", type=int, default=2019)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    cdfs, w_main, u_lat = [], [], {}
    for V in VOCABS:
        p = 1.0 / np.power(np.arange(1, V + 1), 1.05)
        cdfs.append(np.cumsum(p / p.sum()))
        w_main.append(rng.normal(0.0, 0.26, V).astype(np.float32))
    for f, g in PAIR_POOL:
        for idx in (f, g):
            if idx not in u_lat:
                u_lat[idx] = rng.normal(
                    0.0, 0.40, (VOCABS[idx], EMB_K)).astype(np.float32)
    # segment -> pair weights in {-1, 0, +1}; every segment activates 4 of
    # the 6 pool pairs with segment-specific signs
    seg_w = np.zeros((N_SEGS, len(PAIR_POOL)), np.float32)
    for s in range(N_SEGS):
        active = rng.choice(len(PAIR_POOL), 4, replace=False)
        seg_w[s, active] = rng.choice([-1.0, 1.0], 4)
    user_seg = rng.integers(0, N_SEGS, N_USERS)

    header = "label,user_id," + ",".join(
        f"C{i+1}" for i in range(len(VOCABS)))
    t0 = time.time()
    for split, n_split in SPLITS.items():
        n_split = int(n_split * args.scale)
        logit_parts = []
        with open(os.path.join(args.out, f"{split}.csv"), "w",
                  buffering=1 << 22) as fd:
            fd.write(header + "\n")
            done = 0
            while done < n_split:
                n = min(args.chunk, n_split - done)
                users = rng.integers(0, N_USERS, n)
                segs = user_seg[users]
                cats = np.empty((n, len(VOCABS)), np.int64)
                for f in range(len(VOCABS)):
                    cats[:, f] = np.searchsorted(
                        cdfs[f], rng.random(n), side="right")
                logit = np.full(n, BIAS, np.float32)
                for f in range(len(VOCABS)):
                    logit += w_main[f][cats[:, f]]
                for p, (f, g) in enumerate(PAIR_POOL):
                    term = np.einsum("nk,nk->n", u_lat[f][cats[:, f]],
                                     u_lat[g][cats[:, g]])
                    logit += seg_w[segs, p] * term
                y = (rng.random(n) < 1 / (1 + np.exp(-logit))
                     ).astype(np.int8)
                logit_parts.append(logit)
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
    print(f"done -> {args.out} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
