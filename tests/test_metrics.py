"""Metric parity vs sklearn (the reference's metric backend)."""

import numpy as np
import pytest
import sklearn.metrics as skm

from keep_tpu.metrics import (
    auroc,
    auroc_device,
    balanced_accuracy,
    classification_metrics,
    clip_retrieval_metrics,
    retrieval_precision,
    roc_best_threshold,
    sensitivity_specificity,
    weighted_f1,
)
from keep_tpu.metrics.classification import matthews_corrcoef


@pytest.mark.parametrize("n", [50, 999])
def test_auroc_matches_sklearn(n, rng):
    y = rng.integers(0, 2, n)
    y[0], y[1] = 0, 1
    s = rng.random(n)
    assert abs(auroc(y, s) - skm.roc_auc_score(y, s)) < 1e-10
    # with heavy ties
    s_t = np.round(s, 1)
    assert abs(auroc(y, s_t) - skm.roc_auc_score(y, s_t)) < 1e-10
    assert abs(float(auroc_device(y, s_t)) - skm.roc_auc_score(y, s_t)) < 1e-5


def test_best_threshold_matches_sklearn(rng):
    y = rng.integers(0, 2, 500)
    y[:2] = [0, 1]
    s = np.round(rng.random(500), 2)
    fpr, tpr, thr = skm.roc_curve(y, s)
    ref_thd = thr[np.argmax(tpr - fpr)]
    auc_v, thd = roc_best_threshold(y, s)
    assert abs(auc_v - skm.roc_auc_score(y, s)) < 1e-10
    # same Youden J at our threshold as at sklearn's
    ours = (s > thd).astype(int) if np.isfinite(thd) else np.zeros_like(y)
    refs = (s > ref_thd).astype(int) if np.isfinite(ref_thd) else np.zeros_like(y)
    assert (ours == refs).all() or abs(thd - ref_thd) < 1e-12


def test_classification_metrics_match_sklearn(rng):
    y = rng.integers(0, 3, 300)
    p = rng.integers(0, 3, 300)
    got = classification_metrics(y, p)
    assert abs(got["WF1"] - skm.f1_score(y, p, average="weighted")) < 1e-10
    assert abs(got["precision"] - skm.precision_score(y, p, average="weighted")) < 1e-10
    assert abs(got["recall"] - skm.recall_score(y, p, average="weighted")) < 1e-10
    assert abs(got["mcc"] - skm.matthews_corrcoef(y, p)) < 1e-10
    assert abs(got["Accuracy"] - skm.accuracy_score(y, p)) < 1e-10
    assert abs(weighted_f1(y, p) - skm.f1_score(y, p, average="weighted")) < 1e-10
    assert abs(matthews_corrcoef(y, p) - skm.matthews_corrcoef(y, p)) < 1e-10


def test_binary_metrics(rng):
    y = rng.integers(0, 2, 200)
    p = rng.integers(0, 2, 200)
    sens, spec = sensitivity_specificity(y, p)
    cm = skm.confusion_matrix(y, p)
    assert abs(sens - cm[1, 1] / cm[1].sum()) < 1e-12
    assert abs(spec - cm[0, 0] / cm[0].sum()) < 1e-12
    assert abs(
        balanced_accuracy(y, p) - skm.balanced_accuracy_score(y, p)
    ) < 1e-12


def test_retrieval_precision():
    targets = [0, 1, 2]
    preds = [
        list(range(100)),          # 0 in top10
        [9, 5, 1] + list(range(100, 147)),  # 1 in top10
        list(range(3, 60)) + [2],  # 2 only at rank 58 → in top-? no (58>=50)
    ]
    out = retrieval_precision(targets, preds)
    assert out["p@10"] == pytest.approx(2 / 3)
    assert out["p@50"] == pytest.approx(2 / 3)


def test_clip_retrieval_metrics(rng):
    f = rng.standard_normal((20, 8))
    f = f / np.linalg.norm(f, axis=1, keepdims=True)
    m = clip_retrieval_metrics(f, f)  # identical pairs → perfect retrieval
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_mean_rank"] == 1.0


def test_degenerate_cohorts_yield_nan_not_crash():
    """Single-class cohorts: AUC nan (not roc_curve ValueError), sens/spec
    nan on the missing side (not ZeroDivisionError) — regressions."""
    from keep_tpu.metrics.classification import (
        classification_metrics,
        sensitivity_specificity,
    )

    m = classification_metrics([1, 1, 1], [1, 0, 1],
                               y_pred_proba=[0.9, 0.2, 0.8])
    assert np.isnan(m["AUC"])
    sens, spec = sensitivity_specificity([1, 1, 1, 1], [1, 0, 1, 1])
    assert sens == 0.75 and np.isnan(spec)
    sens2, spec2 = sensitivity_specificity(["a", "b"], ["a", "b"])
    assert np.isnan(sens2) and np.isnan(spec2)
