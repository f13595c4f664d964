"""Evaluation metrics: PSNR, ARI, IoU (host-side numpy where the reference
used sklearn; jittable pieces live in ops/).

Parity: ARI via sklearn (reference ``engines/eval.py:66-69``), binary IoU via
confusion matrix (reference ``utils/get_metrics.py:15-26``).
"""
from __future__ import annotations

import numpy as np


def psnr(mse: float) -> float:
    return float(-10.0 * np.log10(mse))


def adjusted_rand_score(labels_true: np.ndarray, labels_pred: np.ndarray) -> float:
    """sklearn ARI (permutation-invariant clustering agreement)."""
    from sklearn.metrics import adjusted_rand_score as _ari

    return float(_ari(np.asarray(labels_true).reshape(-1), np.asarray(labels_pred).reshape(-1)))


def seg_ari(sem_gt: np.ndarray, sem_pred: np.ndarray) -> dict:
    """ARI + foreground-only ARI (reference ``engines/trainer.py:190-194``)."""
    fg = sem_gt == 1
    return {
        "ari": adjusted_rand_score(sem_gt.reshape(-1), sem_pred.reshape(-1)),
        "ari_fg": adjusted_rand_score(sem_gt[fg].reshape(-1), sem_pred[fg].reshape(-1)),
    }


def weights_log(masks: np.ndarray) -> np.ndarray:
    """Log-balanced binary class weights (reference ``utils/misc.py:7-14``;
    computed by the ray/patch datasets as ``class_w``, unused downstream —
    kept for API parity)."""
    class_freq = np.array([np.sum(masks == 0), np.sum(masks == 1)], np.float64)
    w = 1.0 / np.log1p(class_freq)
    return (len(class_freq) * w / np.sum(w)).astype(np.float32)


def confusion_matrix_binary(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """2x2 confusion matrix over {0, 1} maps."""
    pred = np.asarray(pred).reshape(-1).astype(np.int64)
    gt = np.asarray(gt).reshape(-1).astype(np.int64)
    cm = np.zeros((2, 2), np.int64)
    for p in (0, 1):
        for g in (0, 1):
            cm[p, g] = np.sum((pred == p) & (gt == g))
    return cm


def binary_iou(pred: np.ndarray, gt: np.ndarray, adaptive: bool = True) -> float:
    """Foreground IoU; with ``adaptive`` the prediction polarity is flipped if
    that scores higher (cluster labels are arbitrary — reference
    ``utils/get_metrics.py:15-26`` handles orientation the same way via its
    mask-reverse tooling)."""
    def iou(p):
        inter = np.sum((p == 1) & (gt == 1))
        union = np.sum((p == 1) | (gt == 1))
        return inter / union if union > 0 else 0.0

    pred = np.asarray(pred)
    gt = np.asarray(gt)
    if adaptive:
        return float(max(iou(pred), iou(1 - pred)))
    return float(iou(pred))
