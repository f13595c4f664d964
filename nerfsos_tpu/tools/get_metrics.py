"""Offline segmentation metrics over saved PNG masks (IoU / ARI / ARI-fg).

Parity: reference ``utils/get_metrics.py`` — binary IoU via confusion matrix
over {0,1}, ARI via sklearn, foreground-restricted ARI; prediction resized to
the GT resolution and thresholded at 0.5.

CLI: ``python -m nerfsos_tpu.tools.get_metrics --gt_dir ... --pred_dir ...``
"""
from __future__ import annotations

import argparse
import glob
import os
from typing import Dict

import numpy as np

from nerfsos_tpu.utils.metrics import adjusted_rand_score


def compute_iou(y_pred: np.ndarray, y_true: np.ndarray) -> np.ndarray:
    """Per-class IoU over labels {0, 1} (reference ``:15-26``)."""
    y_pred = np.asarray(y_pred).reshape(-1).astype(np.int64)
    y_true = np.asarray(y_true).reshape(-1).astype(np.int64)
    ious = []
    for c in (0, 1):
        inter = np.sum((y_pred == c) & (y_true == c))
        union = np.sum((y_pred == c) | (y_true == c))
        ious.append(inter / union if union else 0.0)
    return np.array(ious, np.float32)


def cal_seg_metrics(gt_dir: str, pred_dir: str) -> Dict[str, float]:
    import cv2

    gt_paths = sorted(glob.glob(os.path.join(gt_dir, "*.png")))
    pred_paths = sorted(glob.glob(os.path.join(pred_dir, "*.png")))
    ars, ars_fg, ious = [], [], []
    for gp, pp in zip(gt_paths, pred_paths):
        gt = cv2.imread(gp)[..., 0] / 255.0
        pred = cv2.imread(pp)[..., 0] / 255.0
        pred = cv2.resize(pred, gt.shape[::-1])
        pred = (pred >= 0.5).astype(np.float32)
        gt_b = (gt >= 0.5).astype(np.float32)

        ars.append(adjusted_rand_score(gt_b.reshape(-1), pred.reshape(-1)))
        fg = gt_b == 1
        ars_fg.append(adjusted_rand_score(gt_b[fg].reshape(-1), pred[fg].reshape(-1)))
        ious.append(compute_iou(pred, gt_b)[1])

    out = {
        "ari": float(np.mean(ars)) if ars else 0.0,
        "ari_fg": float(np.mean(ars_fg)) if ars_fg else 0.0,
        "iou": float(np.mean(ious)) if ious else 0.0,
        "n": len(ars),
    }
    print(out)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--pred_dir", required=True)
    a = p.parse_args()
    cal_seg_metrics(a.gt_dir, a.pred_dir)


if __name__ == "__main__":
    main()
