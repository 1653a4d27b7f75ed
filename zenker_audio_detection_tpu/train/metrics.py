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


def hf_eval_metrics(logits, labels, *, loss, runtime, batch_size,
                    epoch) -> dict[str, float]:
    """Metric dict shaped like the reference trainer's `trainer.evaluate()`
    output (executed-reference differential, test_trainer_exec_parity.py):
    HF prefixes the compute_metrics keys with `eval_`, prepends the eval
    loss, appends speed metrics (transformers.trainer_utils.speed_metrics
    rounding: runtime to 4 places, rates to 3) and reports the final
    `epoch` unprefixed (train_ast_stage1_cross_validation.py:528-537)."""
    n = int(len(labels))
    m: dict[str, float] = {"eval_loss": float(loss)}
    for k, v in compute_metrics_from_logits(logits, labels).items():
        m[f"eval_{k}"] = v
    runtime = max(float(runtime), 1e-9)
    steps = -(-n // int(batch_size)) if n else 0
    m["eval_runtime"] = round(runtime, 4)
    m["eval_samples_per_second"] = round(n / runtime, 3)
    m["eval_steps_per_second"] = round(steps / runtime, 3)
    m["epoch"] = float(epoch)
    return m


def confusion_and_report(y_true, y_pred, class_names) -> tuple[np.ndarray, str]:
    from sklearn.metrics import classification_report, confusion_matrix

    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    report = classification_report(
        y_true, y_pred, labels=list(range(len(class_names))),
        target_names=class_names, digits=4, zero_division=0)
    return cm, report
