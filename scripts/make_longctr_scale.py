"""Generate a lifelong-sequence (LongCTR) dataset with a planted
LONG-RANGE signal, in the side-table layout the LongCTR stack consumes
(cf. /root/reference/model_zoo/LongCTR/longctr_dataloader.py:26-187):
``user_info.parquet`` (full item sequences, 300..1000 events),
``item_info.parquet`` (item -> cate), interaction parquets with
(user_index, item_index, seq_len, clk), and a hand-written
feature_map.json — plus {split}_true_logit.npy for the Bayes ceiling.

The label depends on the TARGET-CATEGORY sub-history aggregated over the
ENTIRE sequence:

    logit = w1 * <v_t, mean(v_i : cate_i == cate_t)>      (affinity)
          + w2 * log1p(#matches) + w3 * <v_t, mean(last 50)> + bias

History events carry no temporal ordering, so the same-category matches
are uniformly spread over the 300-1000 positions: a model truncated to
the last 100 events sees only ~10-30% of them, while retrieval models
(SIM/ETA/TWIN GSU->ESU) and full-length attention recover the signal.
That is precisely the LongCTR family's reason to exist — the benchmark
measures it as AUC vs the planted ceiling at max_len 1000 vs 100.
"""

import argparse
import json
import os
import time

import numpy as np
import pandas as pd

N_USERS = 60_000
N_ITEMS = 100_000
N_CATES = 1_000
EMB_K = 8
MAX_LEN = 1_000
MIN_LEN = 300
SPLITS = {"train": 2_000_000, "valid": 250_000, "test": 250_000}
W_AFF, W_CNT, W_RECENT, BIAS = 0.32, 0.22, 0.30, -3.15


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/ctr_scale/longctr_raw")
    ap.add_argument("--seed", type=int, default=2019)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--chunk", type=int, default=250_000)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    n_users = max(64, int(N_USERS * min(1.0, args.scale * 4)))

    # catalog: Zipf popularity; latent vectors correlated within a category
    pop = 1.0 / np.power(np.arange(1, N_ITEMS + 1), 1.05)
    item_cdf = np.cumsum(pop / pop.sum())
    item_cate = rng.integers(1, N_CATES + 1, N_ITEMS)
    cate_vec = rng.normal(0, 1.0, (N_CATES + 1, EMB_K)).astype(np.float32)
    item_vec = (0.75 * cate_vec[item_cate]
                + 0.65 * rng.normal(0, 1.0, (N_ITEMS, EMB_K))
                ).astype(np.float32)
    user_vec = rng.normal(0, 1.0, (n_users, EMB_K)).astype(np.float32)

    # per-user lifelong histories: interest-biased popularity draws, no
    # temporal structure (=> matches uniform over positions)
    lens = rng.integers(MIN_LEN, MAX_LEN + 1, n_users)
    off = np.zeros(n_users + 1, np.int64)
    off[1:] = np.cumsum(lens)
    total = int(off[-1])
    flat = np.empty(total, np.int64)
    t0 = time.time()
    for u in range(n_users):
        L = lens[u]
        ids = np.searchsorted(item_cdf, rng.random(L), side="right")
        aff = item_vec[ids] @ user_vec[u]
        redraw = rng.random(L) >= 1 / (1 + np.exp(-aff))
        ids[redraw] = np.searchsorted(item_cdf, rng.random(redraw.sum()),
                                      side="right")
        flat[off[u]:off[u + 1]] = ids
    print(f"histories: {total} events over {n_users} users "
          f"({time.time() - t0:.0f}s)", flush=True)

    # per-(user, cate) vector sums + counts via one sort-free segment pass
    flat_user = np.repeat(np.arange(n_users, dtype=np.int64), lens)
    keys = flat_user * (N_CATES + 1) + item_cate[flat]
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    starts = np.flatnonzero(np.r_[True, skeys[1:] != skeys[:-1]])
    uniq_keys = skeys[starts]
    counts = np.diff(np.r_[starts, len(skeys)])
    vec_sorted = item_vec[flat[order]]
    sums = np.add.reduceat(vec_sorted, starts, axis=0)
    del vec_sorted, keys, skeys, order, flat_user
    # per-user recent-window mean (last 50 events) + seq_len on disk
    recent_mean = np.stack([item_vec[flat[off[u + 1] - 50:off[u + 1]]]
                            .mean(0) for u in range(n_users)])
    print(f"aggregates: {len(uniq_keys)} (user,cate) pairs", flush=True)

    # side tables ---------------------------------------------------------
    user_seqs = [(flat[off[u]:off[u + 1]] + 1).tolist()
                 for u in range(n_users)]
    pd.DataFrame({"full_item_seq": user_seqs}).to_parquet(
        os.path.join(args.out, "user_info.parquet"))
    pd.DataFrame({
        "item_index": np.arange(N_ITEMS + 1),
        "item_id": np.arange(N_ITEMS + 1),
        "cate_id": np.r_[0, item_cate],
    }).to_parquet(os.path.join(args.out, "item_info.parquet"))

    feature_map = {
        "dataset_id": "longctr_syn",
        "num_fields": 3,
        "total_features": 2 + n_users + (N_ITEMS + 1) + N_CATES,
        "input_length": 0,
        "labels": ["clk"],
        "features": [
            {"user_feat": {"source": "user", "type": "categorical",
                           "padding_idx": 0, "vocab_size": n_users + 1}},
            {"item_id": {"source": "item", "type": "categorical",
                         "padding_idx": 0, "vocab_size": N_ITEMS + 1}},
            {"cate_id": {"source": "item", "type": "categorical",
                         "padding_idx": 0, "vocab_size": N_CATES + 1}},
        ],
    }
    with open(os.path.join(args.out, "feature_map.json"), "w") as fd:
        json.dump(feature_map, fd, indent=4)

    # interactions --------------------------------------------------------
    for split, n_split in SPLITS.items():
        n_split = int(n_split * args.scale)
        frames, logit_parts, done = [], [], 0
        while done < n_split:
            n = min(args.chunk, n_split - done)
            users = rng.integers(0, n_users, n)
            # targets: popularity draws, half re-ranked toward interest
            tgt = np.searchsorted(item_cdf, rng.random(n), side="right")
            aff = np.einsum("nk,nk->n", item_vec[tgt], user_vec[users])
            redraw = rng.random(n) >= 1 / (1 + np.exp(-aff))
            tgt[redraw] = np.searchsorted(
                item_cdf, rng.random(int(redraw.sum())), side="right")
            k = users * (N_CATES + 1) + item_cate[tgt]
            pos = np.searchsorted(uniq_keys, k)
            pos_ok = (pos < len(uniq_keys)) & (uniq_keys[np.minimum(
                pos, len(uniq_keys) - 1)] == k)
            idx = np.where(pos_ok, pos, 0)
            cnt = np.where(pos_ok, counts[idx], 0)
            mean_vec = np.where(pos_ok[:, None],
                                sums[idx] / np.maximum(cnt, 1)[:, None], 0.0)
            tv = item_vec[tgt]
            logit = (W_AFF * np.einsum("nk,nk->n", tv, mean_vec)
                     + W_CNT * np.log1p(cnt)
                     + W_RECENT * np.einsum("nk,nk->n", tv,
                                            recent_mean[users])
                     + BIAS).astype(np.float32)
            y = (rng.random(n) < 1 / (1 + np.exp(-logit))).astype(np.float32)
            frames.append(pd.DataFrame({
                "user_index": users,
                "user_feat": users + 1,
                "item_index": tgt + 1,
                "seq_len": np.minimum(lens[users], MAX_LEN),
                "clk": y,
            }))
            logit_parts.append(logit)
            done += n
            print(f"[{split}] {done}/{n_split}", flush=True)
        pd.concat(frames, ignore_index=True).to_parquet(
            os.path.join(args.out, f"{split}.parquet"))
        np.save(os.path.join(args.out, f"{split}_true_logit.npy"),
                np.concatenate(logit_parts))
    print(f"done -> {args.out} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
