"""Classification metrics matching the reference's compute_metrics
(src/train_ast_stage1_cross_validation.py:313-341): HF evaluate
accuracy/precision/recall/f1 with average="binary" — numerically identical
to the sklearn calls below (evaluate wraps sklearn)."""

from __future__ import annotations

import numpy as np


def binary_metrics(y_true, y_pred) -> dict[str, float]:
    from sklearn.metrics import (accuracy_score, f1_score, precision_score,
                                 recall_score)

    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return {
        "accuracy": float(accuracy_score(y_true, y_pred)),
        "precision": float(precision_score(y_true, y_pred, average="binary",
                                           zero_division=0)),
        "recall": float(recall_score(y_true, y_pred, average="binary",
                                     zero_division=0)),
        "f1": float(f1_score(y_true, y_pred, average="binary",
                             zero_division=0)),
    }


def compute_metrics_from_logits(logits, labels) -> dict[str, float]:
    return binary_metrics(labels, np.argmax(np.asarray(logits), axis=-1))


def confusion_and_report(y_true, y_pred, class_names) -> tuple[np.ndarray, str]:
    from sklearn.metrics import classification_report, confusion_matrix

    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    report = classification_report(
        y_true, y_pred, labels=list(range(len(class_names))),
        target_names=class_names, digits=4, zero_division=0)
    return cm, report
