"""Evaluation metrics — the reference's exact four-metric surface.

Reference ``utils.py:13-47``: accuracy, balanced accuracy, weighted F1,
weighted one-vs-rest ROC-AUC via sklearn. The reference hardcodes
``num_classes=100`` in its one-hot (which would crash on true 10-class MNIST
labels, SURVEY §2.9.3); here ``num_classes`` is a parameter. Metrics run on
host at epoch boundaries — never in the jitted step (the reference syncs
predictions to CPU every batch, ``train.py:42-44``; kanvit accumulates
device-side and transfers once per epoch).
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    balanced_accuracy_score,
    f1_score,
    roc_auc_score,
)


def calculate_metrics(y_true, y_pred, y_pred_proba, num_classes: int = 100):
    """Returns ``(accuracy, balanced_accuracy, f1, roc_auc)``."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    y_pred_proba = np.asarray(y_pred_proba)

    accuracy = accuracy_score(y_true, y_pred)
    balanced_accuracy = balanced_accuracy_score(y_true, y_pred)
    f1 = f1_score(y_true, y_pred, average="weighted")

    y_true_bin = np.eye(num_classes, dtype=np.int64)[y_true]
    try:
        roc_auc = roc_auc_score(
            y_true_bin, y_pred_proba, average="weighted", multi_class="ovr"
        )
    except ValueError:
        # A class absent from y_true makes OvR AUC undefined for it
        # (tiny eval subsets); report NaN rather than crash.
        roc_auc = float("nan")

    return accuracy, balanced_accuracy, f1, roc_auc
