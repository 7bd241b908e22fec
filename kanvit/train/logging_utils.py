"""Logging surface matching the reference (``utils.py:50-94,298-328``).

Same two artifacts: a timestamped ``training_%Y%m%d_%H%M%S.log`` (file +
console via the stdlib logging module) and a metrics text file appended by
``save_metrics`` with the same flag semantics (flag=0: train entry with epoch
header; flag=1: test entry without). The metrics filename stem is
parameterized by dataset (the reference hardcodes ``mnist_metrics_`` even
for its CIFAR run, ``utils.py:328`` — kept as the default).
"""

from __future__ import annotations

import datetime
import logging
import os


def setup_logging(log_dir: str = "logs", dataset: str = "mnist") -> str:
    os.makedirs(log_dir, exist_ok=True)
    timestamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    log_filename = os.path.join(log_dir, f"training_{timestamp}.log")
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=[logging.FileHandler(log_filename), logging.StreamHandler()],
        force=True,
    )
    return os.path.join(log_dir, f"{dataset}_metrics_{timestamp}.txt")


def save_metrics(
    filename, epoch, phase, loss, accuracy, balanced_accuracy, f1, roc_auc, flag
):
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    with open(filename, "a") as f:
        if flag == 0:
            f.write(f"Epoch: {epoch}, Phase: {phase}\n")
        else:
            f.write(f"Phase: {phase}\n")
        f.write(f"  Loss: {loss:.4f}\n")
        f.write(f"  Accuracy: {accuracy:.4f}\n")
        f.write(f"  Balanced Accuracy: {balanced_accuracy:.4f}\n")
        f.write(f"  F1 Score: {f1:.4f}\n")
        f.write(f"  ROC AUC: {roc_auc:.4f}\n\n")
