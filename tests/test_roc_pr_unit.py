"""Unit tests for analysis/roc_pr.py internals (curve metrics, bootstrap,
plotting) without model inference."""

import json
from pathlib import Path

import numpy as np
import pytest

from zenker_audio_detection_tpu.analysis import roc_pr


@pytest.fixture
def scored(rng):
    y = rng.integers(0, 2, 200)
    s = np.clip(y * 0.6 + rng.standard_normal(200) * 0.3 + 0.2, 0, 1)
    return y, s


def test_curve_metrics_keys(scored):
    y, s = scored
    m = roc_pr._curve_metrics(y, s, ["Idle", "Swallow"], [0.5])
    for k in ["roc_auc", "pr_auc", "roc_auc_ci_lower", "roc_auc_ci_upper",
              "pr_auc_ci_lower", "pr_auc_ci_upper", "thr_0.5_confusion",
              "thr_0.5_precision", "thr_0.5_recall", "thr_0.5_f1",
              "roc_curve", "pr_curve", "best_f1_threshold", "best_f1",
              "best_f1_precision", "best_f1_recall"]:
        assert k in m, k
    assert m["roc_auc_ci_lower"] <= m["roc_auc"] <= m["roc_auc_ci_upper"]
    # best-F1 threshold really is the argmax over PR-curve thresholds
    from sklearn.metrics import precision_recall_curve
    p, r, t = precision_recall_curve(y, s)
    f1 = 2 * p[:-1] * r[:-1] / np.clip(p[:-1] + r[:-1], 1e-8, None)
    assert m["best_f1"] == pytest.approx(float(f1.max()))


def test_bootstrap_ci_deterministic(scored):
    from sklearn.metrics import roc_auc_score

    y, s = scored
    a = roc_pr.bootstrap_ci(y, s, roc_auc_score, n_bootstrap=200)
    b = roc_pr.bootstrap_ci(y, s, roc_auc_score, n_bootstrap=200)
    assert a == b
    assert a[0] < a[1]


def test_plot_payload_outputs(tmp_path, scored):
    y, s = scored
    rep = {"fold": 1, "split": "val"}
    rep.update(roc_pr._curve_metrics(y, s, ["Healthy", "Zenker"], [0.5]))
    rep2 = dict(rep, fold=2)
    agg = roc_pr._curve_metrics(y, s, ["Healthy", "Zenker"], [0.5])
    payload = {"fold_reports": [rep, rep2], "aggregate": agg,
               "decision_thresholds_evaluated": [0.5]}
    roc_pr.plot_payload(payload, str(tmp_path), stage="stage2",
                        combined=True, individual=True, fmt="both")
    assert (tmp_path / "stage2_roc_combined.png").exists()
    assert (tmp_path / "stage2_pr_combined.pdf").exists()
    assert (tmp_path / "stage2_fold1.png").exists()
    assert (tmp_path / "stage2_fold2.pdf").exists()


def test_load_split_val_fallback(tmp_path):
    d = tmp_path
    np.save(d / "test_x_fold1.npy", np.asarray(["a.wav"], object))
    np.save(d / "test_y_fold1.npy", np.asarray([1]))
    X, y, used = roc_pr.load_split(str(d), 1, "val")
    assert used == "test"
    np.save(d / "val_x_fold1.npy", np.asarray(["b.wav"], object))
    np.save(d / "val_y_fold1.npy", np.asarray([0]))
    X, y, used = roc_pr.load_split(str(d), 1, "val")
    assert used == "val" and X == ["b.wav"]
    with pytest.raises(FileNotFoundError):
        roc_pr.load_split(str(d), 2, "val")
