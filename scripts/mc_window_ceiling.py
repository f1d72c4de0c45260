"""Monte-Carlo estimate of the EXACT last-100-window Bayes predictor for
the v3 LongCTR benchmark (scripts/make_longctr_scale.py).

Under v3's iid popularity draws, everything a max_len=100 model can know
about a row is: the target item's identity (hence its latent e_t, cate
c_t, popularity p_t — all learnable per-item constants), seq_len (hence
L_early), and the window contents (whose only label-relevant statistic
is the recency term; early realizations are conditionally independent of
the window). The exact window predictor is therefore

  E[y | row] = E_{m_t, n_o, S_o} sigmoid( wP*1[m_t>0]
        + wE * <e_t, (m_t*e_t + S_o) / max(m_t+n_o, 1)> * 1[m_t+n_o>0]
        + wR*rec + BIAS )

with m_t ~ Binomial(L_early, p_t) (target's own early occurrences — note
the coupling: each contributes e_t to the same-cate mean, which is HOW a
repeat also moves the affinity), n_o ~ Binomial(L_early, q_c - p_t)
(other same-cate matches), and S_o the sum of n_o popularity-weighted
draws of same-cate item e-vectors, approximated as Gaussian with the
cate's popularity-weighted empirical moments (CLT in n_o; exact in the
dominant m_t coupling). The MC average over K samples per row is the
exact-ceiling estimate the plug-in window predictor lower-bounds.

Writes {split}_mcwindow_logit.npy (logit of the MC probability) next to
the raw data and prints the AUC of plug-in vs MC ceiling vs Bayes.
"""

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import make_longctr_scale as gen


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--raw", default="/tmp/ctr_scale/longctr_raw")
    ap.add_argument("--seed", type=int, default=2019)
    ap.add_argument("--mc", type=int, default=128)
    ap.add_argument("--splits", nargs="+", default=["valid", "test"])
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)

    # regenerate the catalog EXACTLY as the generator does (same seed
    # stream order: pop -> item_cate -> cate_vec -> item_e -> item_vec)
    n_items, n_cates, K = gen.N_ITEMS, gen.N_CATES, gen.EMB_K
    pop = 1.0 / np.power(np.arange(1, n_items + 1), 0.6)
    p_item = (pop / pop.sum()).astype(np.float64)
    item_cate = rng.integers(1, n_cates + 1, n_items)
    cate_vec = rng.normal(0, 1.0, (n_cates + 1, K)).astype(np.float32)
    item_e = rng.normal(0, 1.0, (n_items, K)).astype(np.float32)

    # per-cate popularity mass + popularity-weighted e moments
    q_c = np.bincount(item_cate, weights=p_item, minlength=n_cates + 1)
    mu_c = np.zeros((n_cates + 1, K))
    var_c = np.ones((n_cates + 1, K))
    for k in range(K):
        s1 = np.bincount(item_cate, weights=p_item * item_e[:, k],
                         minlength=n_cates + 1)
        s2 = np.bincount(item_cate, weights=p_item * item_e[:, k] ** 2,
                         minlength=n_cates + 1)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu_c[:, k] = np.where(q_c > 0, s1 / np.maximum(q_c, 1e-30), 0)
            var_c[:, k] = np.where(
                q_c > 0, s2 / np.maximum(q_c, 1e-30) - mu_c[:, k] ** 2, 1.0)
    var_c = np.maximum(var_c, 1e-6)

    from sklearn.metrics import roc_auc_score
    for split in args.splits:
        df = pd.read_parquet(os.path.join(args.raw, f"{split}.parquet"))
        y = df["clk"].to_numpy()
        tgt = df["item_index"].to_numpy() - 1
        l_early = np.maximum(df["seq_len"].to_numpy() - gen.WINDOW, 0)
        win = np.load(os.path.join(args.raw, f"{split}_window_logit.npy"))
        true = np.load(os.path.join(args.raw, f"{split}_true_logit.npy"))
        # recover the recency term from the saved plug-in logit
        p_t = p_item[tgt]
        p_present = 1.0 - np.power(1.0 - p_t, l_early)
        rec = (win - gen.BIAS - gen.W_PRESENT * p_present) / gen.W_RECENT
        c = item_cate[tgt]
        e_t = item_e[tgt].astype(np.float64)
        et_norm2 = (e_t ** 2).sum(1)
        et_mu = (e_t * mu_c[c]).sum(1)
        et_var = (e_t ** 2 * var_c[c]).sum(1)
        p_other = np.maximum(q_c[c] - p_t, 0.0)

        n = len(y)
        acc = np.zeros(n)
        for _ in range(args.mc):
            m_t = rng.binomial(l_early, p_t)
            n_o = rng.binomial(l_early, p_other)
            tot = m_t + n_o
            # S_o ~ N(n_o * mu_c, n_o * var_c) projected onto e_t
            proj = (n_o * et_mu
                    + rng.standard_normal(n) * np.sqrt(n_o * et_var))
            aff = np.where(tot > 0,
                           (m_t * et_norm2 + proj) / np.maximum(tot, 1), 0.0)
            logit = (gen.W_PRESENT * (m_t > 0) + gen.W_AFF * aff
                     + gen.W_RECENT * rec + gen.BIAS)
            acc += 1.0 / (1.0 + np.exp(-logit))
        p_mc = np.clip(acc / args.mc, 1e-7, 1 - 1e-7)
        mc_logit = np.log(p_mc / (1 - p_mc)).astype(np.float32)
        np.save(os.path.join(args.raw, f"{split}_mcwindow_logit.npy"),
                mc_logit)
        print(f"[{split}] plugin_window_AUC={roc_auc_score(y, win):.6f} "
              f"mc_window_AUC={roc_auc_score(y, mc_logit):.6f} "
              f"bayes_AUC={roc_auc_score(y, true):.6f}", flush=True)


if __name__ == "__main__":
    main()
