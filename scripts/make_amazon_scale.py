"""Generate an AmazonElectronics_x1-shaped behavior-sequence dataset with a
planted sequential signal (BASELINE.md tracked config: DIN/Amazon).

Shape follows the BARS AmazonElectronics_x1 benchmark: ~63k items over 801
categories, click sequences up to max_len 100, ~3M samples. The label
depends on the match between the TARGET item and the user's HISTORY
(latent-vector affinity + same-category share + recency boost), so
sequence models (DIN target attention) can beat history-blind models and
the planted Bayes AUC is measurable from the saved true logits.

Output: train/valid/test csv with columns
  label, user_id, item_id, cate_id, item_history, cate_history
(history columns are ^-joined id strings, the reference's sequence csv
format), plus {split}_true_logit.npy.
"""

import argparse
import os
import time

import numpy as np

N_ITEMS = 63_000
N_CATES = 800
N_USERS = 200_000
MAX_LEN = 100
EMB_K = 8
SPLITS = {"train": 2_600_000, "valid": 250_000, "test": 384_000}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ctr_scale/amazon_raw")
    ap.add_argument("--seed", type=int, default=2019)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--chunk", type=int, default=200_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)

    # catalog: Zipf item popularity, items clustered into categories,
    # latent affinity vectors correlated within a category
    item_pop = 1.0 / np.power(np.arange(1, N_ITEMS + 1), 1.1)
    item_pop /= item_pop.sum()
    item_cdf = np.cumsum(item_pop)
    item_cate = rng.integers(1, N_CATES + 1, N_ITEMS)
    cate_vec = rng.normal(0, 1.0, (N_CATES + 1, EMB_K)).astype(np.float32)
    item_vec = (0.7 * cate_vec[item_cate]
                + 0.7 * rng.normal(0, 1.0, (N_ITEMS, EMB_K))
                ).astype(np.float32)

    # users: per-user interest vector; histories sampled by popularity x
    # interest affinity within the user's preferred categories
    user_len = np.clip(rng.geometric(0.025, N_USERS), 5, MAX_LEN)
    user_vec = rng.normal(0, 1.0, (N_USERS, EMB_K)).astype(np.float32)

    def sample_items(n, bias_vec=None):
        """Popularity-sampled item ids (0-based), optionally re-ranked
        toward an interest vector by rejection-free mixture."""
        ids = np.searchsorted(item_cdf, rng.random(n), side="right")
        if bias_vec is not None:
            # half the draws come from the user's top-affinity pool
            aff = item_vec[ids] @ bias_vec
            keep = rng.random(n) < 1 / (1 + np.exp(-aff))
            ids2 = np.searchsorted(item_cdf, rng.random(n), side="right")
            ids = np.where(keep, ids, ids2)
        return ids

    # precompute per-user histories (ragged, stored flat)
    hist_flat = []
    hist_off = np.zeros(N_USERS + 1, np.int64)
    for u in range(N_USERS):
        L = user_len[u]
        hist_flat.append(sample_items(L, user_vec[u]))
        hist_off[u + 1] = hist_off[u] + L
    hist_flat = np.concatenate(hist_flat)
    print(f"catalog+histories ready: {hist_off[-1]} history events",
          flush=True)

    header = "label,user_id,item_id,cate_id,item_history,cate_history"
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
                targets = sample_items(n)
                # history views (truncated to the last MAX_LEN)
                rows_hist = [
                    hist_flat[hist_off[u]:hist_off[u + 1]][-MAX_LEN:]
                    for u in users]
                hmean = np.stack([item_vec[h].mean(0) for h in rows_hist])
                hlast = np.stack([item_vec[h[-5:]].mean(0)
                                  for h in rows_hist])
                same_cate = np.asarray([
                    np.mean(item_cate[h] == item_cate[t])
                    for h, t in zip(rows_hist, targets)], np.float32)
                tv = item_vec[targets]
                logit = (0.9 * np.einsum("nk,nk->n", tv, hmean)
                         + 0.6 * np.einsum("nk,nk->n", tv, hlast)
                         + 1.6 * same_cate - 2.1).astype(np.float32)
                y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(np.int8)
                logit_parts.append(logit)
                lines = []
                for i in range(n):
                    h = rows_hist[i] + 1          # ids are 1-based on disk
                    ch = item_cate[rows_hist[i]]
                    lines.append(
                        f"{int(y[i])},{users[i] + 1},{targets[i] + 1},"
                        f"{item_cate[targets[i]]},"
                        f"{'^'.join(map(str, h))},"
                        f"{'^'.join(map(str, ch))}")
                fd.write("\n".join(lines) + "\n")
                done += n
                print(f"[{split}] {done}/{n_split} "
                      f"({done / max(time.time() - t0, 1e-9):.0f} rows/s)",
                      flush=True)
        np.save(os.path.join(args.out, f"{split}_true_logit.npy"),
                np.concatenate(logit_parts))
    print(f"done in {time.time() - t0:.0f}s -> {args.out}", flush=True)


if __name__ == "__main__":
    main()
