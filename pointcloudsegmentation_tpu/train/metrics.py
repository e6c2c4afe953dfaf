"""IoU / accuracy metrics (reference: train_util.py:4-68).

``compute_iou`` matches the reference's per-class fn/fp/tp accounting; the
streaming variant accumulates a confusion matrix across batches (the
``acc_val`` / ``val2iou`` pattern, train_util.py:36-68) and is jit-friendly.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def confusion_matrix(labels: jnp.ndarray, preds: jnp.ndarray,
                     num_classes: int,
                     mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """[C, C] counts; rows = true label, cols = prediction."""
    labels = labels.reshape(-1)
    preds = preds.reshape(-1)
    idx = labels * num_classes + preds
    w = jnp.ones_like(idx, jnp.float32) if mask is None \
        else mask.reshape(-1).astype(jnp.float32)
    cm = jnp.zeros((num_classes * num_classes,), jnp.float32)
    cm = cm.at[idx].add(w)
    return cm.reshape(num_classes, num_classes)


def iou_from_confusion(cm: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-class IoU/acc + mIoU/oIoU/overall acc from a confusion matrix
    (val2iou semantics, train_util.py:55-68)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    fn = cm.sum(1) - tp
    fp = cm.sum(0) - tp
    denom = tp + fn + fp
    iou = np.where(denom > 0, tp / np.maximum(denom, 1), 0.0)
    acc = np.where(cm.sum(1) > 0, tp / np.maximum(cm.sum(1), 1), 0.0)
    present = cm.sum(1) > 0
    miou = iou[present].mean() if present.any() else 0.0
    # overall IoU: all classes pooled (the reference's oiou)
    oiou = tp.sum() / max(denom.sum(), 1)
    oacc = tp.sum() / max(cm.sum(), 1)
    return {"iou": iou, "acc": acc, "miou": miou, "oiou": oiou, "oacc": oacc}


class MetricAccumulator:
    """Host-side streaming accumulator across eval batches."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.cm = np.zeros((num_classes, num_classes), np.float64)
        self.loss_sum = 0.0
        self.loss_n = 0

    def update(self, cm: jnp.ndarray, loss: float | None = None):
        self.cm += np.asarray(cm)
        if loss is not None:
            self.loss_sum += float(loss)
            self.loss_n += 1

    def result(self) -> Dict[str, np.ndarray]:
        out = iou_from_confusion(self.cm)
        if self.loss_n:
            out["loss"] = self.loss_sum / self.loss_n
        return out
