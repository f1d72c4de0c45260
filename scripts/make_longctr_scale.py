"""Generate a lifelong-sequence (LongCTR) dataset with a planted
LONG-RANGE signal, in the side-table layout the LongCTR stack consumes
(cf. /root/reference/model_zoo/LongCTR/longctr_dataloader.py:26-187):
``user_info.parquet`` (full item sequences, 300..1000 events),
``item_info.parquet`` (item -> cate), interaction parquets with
(user_index, item_index, seq_len, clk), and a hand-written
feature_map.json — plus {split}_true_logit.npy for the Bayes ceiling
and {split}_window_logit.npy for a fitted plug-in last-100-window
predictor (the window information ceiling a max_len=100 model chases).

The long-range components are STRUCTURALLY exclusive to the EARLY
history (everything before the last 100 events) — a last-100 window
cannot observe them even in principle:

    logit = wP * 1[target item in EARLY]                    (early repeat)
          + wE * <e_t, mean(e_i : cate_i == cate_t, i in EARLY)>
          + wR * <v_t, mean(v_i : last 50 events)> + bias   (recency)

where v_i = 0.75*cate_vec[c_i] + 0.65*e_i and the EARLY affinity uses
only the item-IDIOSYNCRATIC parts e_i, so the target's own cate_id
embedding cannot proxy the term. A first version of this benchmark
used full-history aggregates of the full v_i; every model scored an
identical ~0.784 AUC at max_len 100 and 1000 because the cate-mean part
was target-predictable, the recency term sat inside every window, and
log1p(match count) was proxied by the in-window count. With the
early/window split, the best a window model can do is the recency term
plus priors: the saved plug-in predictor uses the recency term, an
empirical P(early-repeat | in-window-repeat, popularity bucket) table
fitted on train rows, and zero for the early affinity. Retrieval models
at max_len=1000 (SIM/ETA/TWIN GSU->ESU surface exact/same-category
matches from the whole sequence) must recover the early evidence to
beat it.
"""

import argparse
import json
import os
import time

import numpy as np
import pandas as pd

N_USERS = 60_000
N_ITEMS = 100_000
N_CATES = 200
EMB_K = 8
MAX_LEN = 1_000
MIN_LEN = 300
WINDOW = 100          # what a max_len=100 model sees; EARLY = the rest
RECENT = 50
SPLITS = {"train": 2_000_000, "valid": 250_000, "test": 250_000}
W_PRESENT, W_AFF, W_RECENT, BIAS = 1.5, 0.55, 0.35, -2.4
POP_BUCKETS = 16


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

    # catalog: Zipf popularity; latent vectors = category part + an
    # item-idiosyncratic part e (kept separate: the planted EARLY
    # affinity uses e only)
    pop = 1.0 / np.power(np.arange(1, N_ITEMS + 1), 0.95)
    p_item = (pop / pop.sum()).astype(np.float64)
    item_cdf = np.cumsum(p_item)
    item_cate = rng.integers(1, N_CATES + 1, N_ITEMS)
    cate_vec = rng.normal(0, 1.0, (N_CATES + 1, EMB_K)).astype(np.float32)
    item_e = rng.normal(0, 1.0, (N_ITEMS, EMB_K)).astype(np.float32)
    item_vec = (0.75 * cate_vec[item_cate] + 0.65 * item_e).astype(np.float32)
    user_vec = rng.normal(0, 1.0, (n_users, EMB_K)).astype(np.float32)

    # per-user lifelong histories: interest-biased popularity draws, no
    # temporal structure (=> early matches can't be inferred from order)
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

    # EARLY/WINDOW split per event (positions are slots in flat)
    flat_user = np.repeat(np.arange(n_users, dtype=np.int64), lens)
    ends = off[flat_user + 1]
    early_mask = np.arange(total) < (ends - WINDOW)
    ui_keys = flat_user * N_ITEMS + flat
    early_sorted = np.sort(ui_keys[early_mask])
    win_sorted = np.sort(ui_keys[~early_mask])

    # dense per-(user,cate) EARLY aggregates of the idiosyncratic e part
    ec_key = (flat_user * (N_CATES + 1) + item_cate[flat])[early_mask]
    n_cells = n_users * (N_CATES + 1)
    cnt_ec = np.bincount(ec_key, minlength=n_cells).astype(np.int32)
    sum_ec = np.empty((n_cells, EMB_K), np.float32)
    e_early = item_e[flat[early_mask]]
    for k in range(EMB_K):
        sum_ec[:, k] = np.bincount(ec_key, weights=e_early[:, k],
                                   minlength=n_cells)
    cnt_ec = cnt_ec.reshape(n_users, N_CATES + 1)
    sum_ec = sum_ec.reshape(n_users, N_CATES + 1, EMB_K)
    del ec_key, e_early, ui_keys, ends
    # per-user recent-window mean (last RECENT events, inside the window)
    recent_mean = np.stack([item_vec[flat[off[u + 1] - RECENT:off[u + 1]]]
                            .mean(0) for u in range(n_users)])
    print(f"aggregates: {early_mask.sum()} early / "
          f"{(~early_mask).sum()} window events", flush=True)

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

    # popularity buckets for the plug-in window predictor
    pb_edges = np.quantile(p_item, np.linspace(0, 1, POP_BUCKETS + 1)[1:-1])

    # interactions --------------------------------------------------------
    rows = {}
    for split, n_split in SPLITS.items():
        n_split = int(n_split * args.scale)
        frames, logit_parts, done = [], [], 0
        present_parts, winp_parts, pb_parts, rec_parts = [], [], [], []
        while done < n_split:
            n = min(args.chunk, n_split - done)
            users = rng.integers(0, n_users, n)
            # targets: popularity draws, half re-ranked toward interest
            tgt = np.searchsorted(item_cdf, rng.random(n), side="right")
            aff_t = np.einsum("nk,nk->n", item_vec[tgt], user_vec[users])
            redraw = rng.random(n) >= 1 / (1 + np.exp(-aff_t))
            tgt[redraw] = np.searchsorted(
                item_cdf, rng.random(int(redraw.sum())), side="right")

            q = users * N_ITEMS + tgt
            present = (np.searchsorted(early_sorted, q, "right")
                       > np.searchsorted(early_sorted, q, "left"))
            win_present = (np.searchsorted(win_sorted, q, "right")
                           > np.searchsorted(win_sorted, q, "left"))
            c = item_cate[tgt]
            cnt = cnt_ec[users, c]
            mean_e = sum_ec[users, c] / np.maximum(cnt, 1)[:, None]
            e_t = item_e[tgt]
            v_t = item_vec[tgt]
            rec_term = np.einsum("nk,nk->n", v_t, recent_mean[users])
            logit = (W_PRESENT * present
                     + W_AFF * np.einsum("nk,nk->n", e_t, mean_e)
                     + W_RECENT * rec_term
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
            present_parts.append(present)
            winp_parts.append(win_present)
            pb_parts.append(np.digitize(p_item[tgt], pb_edges))
            rec_parts.append(rec_term.astype(np.float32))
            done += n
            print(f"[{split}] {done}/{n_split}", flush=True)
        pd.concat(frames, ignore_index=True).to_parquet(
            os.path.join(args.out, f"{split}.parquet"))
        np.save(os.path.join(args.out, f"{split}_true_logit.npy"),
                np.concatenate(logit_parts))
        rows[split] = (np.concatenate(present_parts),
                       np.concatenate(winp_parts),
                       np.concatenate(pb_parts),
                       np.concatenate(rec_parts))

    # plug-in window predictor: P(early repeat | window repeat, pop
    # bucket) fitted on TRAIN realized indicators; early affinity -> 0
    tr_present, tr_win, tr_pb, _ = rows["train"]
    table = np.zeros((2, POP_BUCKETS), np.float64)
    for w in (0, 1):
        for b in range(POP_BUCKETS):
            sel = (tr_win == w) & (tr_pb == b)
            table[w, b] = tr_present[sel].mean() if sel.any() \
                else tr_present.mean()
    for split, (_, winp, pb, rec) in rows.items():
        win_logit = (W_PRESENT * table[winp.astype(int), pb]
                     + W_RECENT * rec + BIAS).astype(np.float32)
        np.save(os.path.join(args.out, f"{split}_window_logit.npy"),
                win_logit)
    print(f"done -> {args.out} ({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
