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
