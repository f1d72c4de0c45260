"""Generate a multitask CTR/CVR dataset with planted TASK STRUCTURE
(shared + conflicting + task-exclusive signal), at Ali-CCP-like scale.

Two binary labels (click, conversion) from separate planted logits over
16 categorical fields:

  main   = sum_f w_f[C_f]                  (shared, scaled per task)
  shared = sum_{P_shared}  <u_f, u_g>      (same sign in both tasks)
  confl  = sum_{P_confl}   <u_f, u_g>      (+1 x for click, -1 x for conv:
                                            the SAME latent vectors carry
                                            opposite-sign signal -> negative
                                            transfer pressure on a shared
                                            bottom; gated experts (MMoE/PLE)
                                            can specialize)
  excl_t = sum_{P_t}       <u_f, u_g>      (task-exclusive pairs)

v2 additionally plants the SAME structure in learnable categorical-table
form (C_SHARED same-sign, C_CONFL sign-flipped, C_CLICK/C_CONV
exclusive): the first run measured the pairwise-latent terms as
unlearned by every model (ShareBottom/MMoE/PLE all 0.760/0.739 AUC),
so the latent conflict exerted no transfer pressure at all. The
categorical terms are learnable by construction (~1k+ rows per cell),
making the conflict real; the latent terms remain as the hard tail.

Per-row true logits for BOTH tasks are saved, so each task's Bayes
ceiling is measurable on the eval rows (cf. scripts/make_criteo_scale.py).
Output: train/valid/test csv (click,conversion,C1..C16) + true-logit npys.
"""

import argparse
import os
import time

import numpy as np

VOCABS = [200_000, 150_000, 20_000, 10_000, 5_000, 2_000, 1_000, 500,
          200, 100, 60, 40, 24, 12, 8, 4]
EMB_K = 6
P_SHARED = [(0, 2), (1, 3), (4, 5)]
P_CONFL = [(0, 4), (2, 6), (1, 7)]
P_CLICK = [(3, 8), (5, 9)]
P_CONV = [(6, 10), (7, 11)]
# learnable (categorical-table) counterparts of the latent structure —
# added in v2 after the first run measured the pairwise-latent terms as
# unlearned by EVERY model (identical 0.760/0.739 AUC, ~0.06 gap to
# Bayes): conflict = same table, +click/-conversion; exclusive = one
# field per task
C_SHARED = [8, 9]          # vocab 200 / 100, same sign in both tasks
C_CONFL = [10, 11]         # vocab 60 / 40, sign flips between tasks
C_CLICK, C_CONV = 12, 13   # vocab 24 / 12, task-exclusive
W_CAT_STD = 0.45
SPLITS = {"train": 8_000_000, "valid": 1_000_000, "test": 1_000_000}
BIAS_CLICK, BIAS_CONV = -1.62, -2.95
MAIN_CLICK, MAIN_CONV = 1.0, 0.75


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ctr_scale/mtl_raw")
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
        w_main.append(rng.normal(0.0, 0.30, V).astype(np.float32))
    for f, g in P_SHARED + P_CONFL + P_CLICK + P_CONV:
        for idx in (f, g):
            if idx not in u_lat:
                u_lat[idx] = rng.normal(
                    0.0, 0.40, (VOCABS[idx], EMB_K)).astype(np.float32)
    w_cat = {f: rng.normal(0.0, W_CAT_STD, VOCABS[f]).astype(np.float32)
             for f in C_SHARED + C_CONFL + [C_CLICK, C_CONV]}

    header = "click,conversion," + ",".join(
        f"C{i+1}" for i in range(len(VOCABS)))
    t0 = time.time()
    for split, n_split in SPLITS.items():
        n_split = int(n_split * args.scale)
        lg_click, lg_conv = [], []
        with open(os.path.join(args.out, f"{split}.csv"), "w",
                  buffering=1 << 22) as fd:
            fd.write(header + "\n")
            done = 0
            while done < n_split:
                n = min(args.chunk, n_split - done)
                cats = np.empty((n, len(VOCABS)), np.int64)
                for f in range(len(VOCABS)):
                    cats[:, f] = np.searchsorted(
                        cdfs[f], rng.random(n), side="right")
                main = np.zeros(n, np.float32)
                for f in range(len(VOCABS)):
                    main += w_main[f][cats[:, f]]

                def pair_sum(pairs):
                    s = np.zeros(n, np.float32)
                    for f, g in pairs:
                        s += np.einsum("nk,nk->n", u_lat[f][cats[:, f]],
                                       u_lat[g][cats[:, g]])
                    return s

                shared, confl = pair_sum(P_SHARED), pair_sum(P_CONFL)
                cat_sh = sum(w_cat[f][cats[:, f]] for f in C_SHARED)
                cat_cf = sum(w_cat[f][cats[:, f]] for f in C_CONFL)
                lc = (BIAS_CLICK + MAIN_CLICK * main + shared + confl
                      + cat_sh + cat_cf + w_cat[C_CLICK][cats[:, C_CLICK]]
                      + pair_sum(P_CLICK)).astype(np.float32)
                lv = (BIAS_CONV + MAIN_CONV * main + shared - confl
                      + cat_sh - cat_cf + w_cat[C_CONV][cats[:, C_CONV]]
                      + pair_sum(P_CONV)).astype(np.float32)
                yc = (rng.random(n) < 1 / (1 + np.exp(-lc))).astype(np.int8)
                yv = (rng.random(n) < 1 / (1 + np.exp(-lv))).astype(np.int8)
                lg_click.append(lc)
                lg_conv.append(lv)
                cat_s = [",".join(map(str, row)) for row in cats]
                fd.write("\n".join(
                    f"{int(a)},{int(b)},{cs}" for a, b, cs
                    in zip(yc, yv, cat_s)) + "\n")
                done += n
                print(f"[{split}] {done}/{n_split} "
                      f"({done / max(time.time() - t0, 1e-9):.0f} rows/s)",
                      flush=True)
        np.save(os.path.join(args.out, f"{split}_true_logit_click.npy"),
                np.concatenate(lg_click))
        np.save(os.path.join(args.out, f"{split}_true_logit_conversion.npy"),
                np.concatenate(lg_conv))
    print(f"done -> {args.out} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
