"""Metric parity tests vs sklearn and hand-computed grouped values."""

import numpy as np
import pytest
from sklearn.metrics import log_loss, roc_auc_score

from fuxictr_tpu.metrics import MRR, NDCG, evaluate_metrics


def test_scalar_metrics_match_sklearn():
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 2, 1000).astype(np.float64)
    y_pred = rng.uniform(0.01, 0.99, 1000)
    out = evaluate_metrics(y_true, y_pred, ["logloss", "AUC"])
    assert out["logloss"] == pytest.approx(log_loss(y_true, y_pred))
    assert out["AUC"] == pytest.approx(roc_auc_score(y_true, y_pred))


def test_gauc_weighted_by_group_size():
    # group 0: 4 samples AUC=1.0; group 1: 2 samples AUC=0.0; group 2 skipped
    y_true = np.array([0, 0, 1, 1, 0, 1, 0, 0])
    y_pred = np.array([0.1, 0.2, 0.8, 0.9, 0.9, 0.1, 0.5, 0.6])
    gid = np.array([0, 0, 0, 0, 1, 1, 2, 2])
    out = evaluate_metrics(y_true, y_pred, ["gAUC", "avgAUC"], group_id=gid)
    assert out["gAUC"] == pytest.approx((1.0 * 4 + 0.0 * 2) / 6)
    assert out["avgAUC"] == pytest.approx((1.0 + 0.0) / 2)


def test_grouped_requires_group_id():
    with pytest.raises(AssertionError):
        evaluate_metrics(np.array([0, 1]), np.array([0.2, 0.8]), ["gAUC"])


def test_unsupported_metric():
    with pytest.raises(ValueError):
        evaluate_metrics(np.array([0, 1]), np.array([0.2, 0.8]), ["f1"])


def _grouped_reference_loop(y_true, y_pred, group_id, metrics):
    """The reference's per-group (value, weight) reduction
    (/root/reference/fuxictr/metrics.py:57-77) as a test oracle."""
    import pandas as pd
    from fuxictr_tpu.metrics import _resolve_group_metric
    fns = [_resolve_group_metric(m) for m in metrics]
    sums = np.zeros((len(fns), 2))
    df = pd.DataFrame({"g": group_id, "t": y_true, "p": y_pred})
    for _, d in df.groupby("g"):
        yt, yp = d["t"].to_numpy(), d["p"].to_numpy()
        for i, fn in enumerate(fns):
            v = fn(yt, yp)
            sums[i] += v if isinstance(v, tuple) else (v, 1)
    return {m: (num / den if den > 0 else 0.0)
            for m, (num, den) in zip(metrics, sums)}


def test_vectorized_grouped_matches_per_group_loop():
    """The sort-once path reproduces the per-group sklearn loop exactly:
    AUC metrics under heavy score ties (average-rank math is tie-exact),
    rank metrics on untied scores (the reference's own tie order is
    unstable-quicksort noise — see metrics.grouped_metrics docstring)."""
    from fuxictr_tpu.metrics import grouped_metrics
    rng = np.random.default_rng(7)
    n = 5000
    y_true = rng.integers(0, 2, n).astype(np.float64)
    gid = rng.integers(0, 400, n)

    # quantized scores force plenty of exact ties — AUC family
    y_tied = np.round(rng.uniform(0, 1, n), 2)
    got = grouped_metrics(y_true, y_tied, gid, ["gAUC", "avgAUC"])
    want = _grouped_reference_loop(y_true, y_tied, gid, ["gAUC", "avgAUC"])
    for m in ("gAUC", "avgAUC"):
        assert got[m] == pytest.approx(want[m], abs=1e-9), m

    # unique scores — rank family
    y_uniq = rng.permutation(n).astype(np.float64) / n
    metrics = ["MRR", "NDCG(k=3)", "NDCG"]
    got = grouped_metrics(y_true, y_uniq, gid, metrics)
    want = _grouped_reference_loop(y_true, y_uniq, gid, metrics)
    for m in metrics:
        assert got[m] == pytest.approx(want[m], abs=1e-9), m


def test_vectorized_grouped_scales():
    """1M rows / ~500k groups completes in seconds (the loop would take
    minutes); values stay finite and in range."""
    import time
    from fuxictr_tpu.metrics import grouped_metrics
    rng = np.random.default_rng(1)
    n = 1_000_000
    y_true = rng.integers(0, 2, n).astype(np.float64)
    y_pred = rng.uniform(0, 1, n)
    gid = rng.integers(0, 500_000, n)
    t0 = time.perf_counter()
    out = grouped_metrics(y_true, y_pred, gid,
                          ["gAUC", "avgAUC", "MRR", "NDCG(k=5)"])
    dt = time.perf_counter() - t0
    assert dt < 30.0
    assert 0.0 <= out["gAUC"] <= 1.0 and 0.0 <= out["avgAUC"] <= 1.0
    assert out["MRR"] > 0.0 and out["NDCG(k=5)"] > 0.0


def test_mrr():
    y_true = np.array([0, 1, 0])
    y_pred = np.array([0.9, 0.5, 0.1])  # relevant item ranked 2nd
    assert MRR(y_true, y_pred) == pytest.approx(0.5, abs=1e-9)


def test_ndcg_topk():
    y_true = np.array([0, 1, 0, 1])
    y_pred = np.array([0.9, 0.8, 0.7, 0.6])
    ndcg2 = NDCG(k=2)(y_true, y_pred)
    # DCG@2 = 0/log2(2) + 1/log2(3); IDCG@2 = 1/log2(2) + 1/log2(3)
    expected = (1 / np.log2(3)) / (1 + 1 / np.log2(3))
    assert ndcg2 == pytest.approx(expected, abs=1e-9)


def test_ndcg_name_parsing():
    out = evaluate_metrics(
        np.array([0, 1, 0, 1]), np.array([0.9, 0.8, 0.7, 0.6]),
        ["NDCG(k=2)"], group_id=np.zeros(4))
    expected = (1 / np.log2(3)) / (1 + 1 / np.log2(3))
    assert out["NDCG(k=2)"] == pytest.approx(expected, abs=1e-9)
