"""KITTI-style AP evaluation, host-side numpy (SURVEY.md T5).

The reference class vendors the numba-jitted `kitti-object-eval-python`;
offline evaluation is not perf-critical, so this is a dependency-free numpy
implementation of the same protocol:

  - per class x difficulty x metric (3D / BEV) average precision
  - IoU thresholds: Car 0.7, Pedestrian/Cyclist 0.5
  - 40-point interpolated AP (R40, the post-2019 KITTI standard); R11
    available for comparison with older numbers
  - ignore semantics: gts above the difficulty cap are ignored (matching a
    det to them costs nothing); unmatched dets are false positives

Deviation from the official devkit (documented): DontCare regions and
2D-bbox-based filtering of detections are not applied (the reader drops
DontCare labels); for same-pipeline comparisons this is immaterial.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import numpy as np


CLASS_IOU_THRESHOLDS = {"Car": 0.7, "Pedestrian": 0.5, "Cyclist": 0.5}
CLASS_NAMES = ("Car", "Pedestrian", "Cyclist")
DIFFICULTIES = ("easy", "moderate", "hard")


@dataclasses.dataclass
class FrameDetections:
    """Detections for one frame (one class or mixed; class ids given)."""

    boxes7: np.ndarray      # [D, 7]
    scores: np.ndarray      # [D]
    classes: np.ndarray     # [D] int32


@dataclasses.dataclass
class FrameGroundTruth:
    boxes7: np.ndarray      # [G, 7]
    classes: np.ndarray     # [G] int32
    difficulty: np.ndarray  # [G] int32 (0/1/2, -1 = ignore always)


def _match_frame(gt_boxes, gt_ignored, det_boxes, det_scores, iou_fn,
                 iou_thr):
    """Greedy score-ordered matching. Returns (tp_flags, ignore_flags) per
    det (score-desc order) and number of non-ignored gts."""
    order = np.argsort(-det_scores)
    det_boxes = det_boxes[order]
    n_gt = len(gt_boxes)
    assigned = np.zeros(n_gt, bool)
    tp = np.zeros(len(det_boxes), bool)
    ign = np.zeros(len(det_boxes), bool)
    if n_gt and len(det_boxes):
        iou = iou_fn(det_boxes, gt_boxes)          # [D, G]
        for d in range(len(det_boxes)):
            best, best_iou = -1, iou_thr
            for g in range(n_gt):
                if assigned[g]:
                    continue
                if iou[d, g] >= best_iou:
                    # prefer non-ignored gts
                    if best >= 0 and not gt_ignored[best] and gt_ignored[g]:
                        continue
                    best, best_iou = g, iou[d, g]
            if best >= 0:
                assigned[best] = True
                if gt_ignored[best]:
                    ign[d] = True
                else:
                    tp[d] = True
    return tp, ign, int(np.sum(~gt_ignored)), det_scores[order]


def _average_precision(scores, tp, ign, total_gt, num_points=40):
    """Interpolated AP from pooled matches."""
    if total_gt == 0:
        return 0.0
    keep = ~ign
    scores, tp = scores[keep], tp[keep]
    order = np.argsort(-scores)
    tp = tp[order]
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(~tp)
    recall = tp_cum / total_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1)
    if num_points == 11:
        sample = np.linspace(0, 1, 11)
    else:
        sample = np.linspace(1.0 / num_points, 1.0, num_points)
    ap = 0.0
    for r in sample:
        p = precision[recall >= r]
        ap += (p.max() if len(p) else 0.0) / len(sample)
    return float(ap)


def evaluate(gts: Sequence[FrameGroundTruth],
             dets: Sequence[FrameDetections],
             metric: str = "3d", num_points: int = 40
             ) -> Dict[str, float]:
    """Evaluate detections over a split.

    Args:
      gts/dets: parallel per-frame lists.
      metric: "3d" (rotated 3D IoU) or "bev" (rotated BEV IoU).

    Returns:
      {"Car_3d_moderate": AP, ...} for all class x difficulty cells.
    """
    assert len(gts) == len(dets)
    from dcf import native
    if metric == "3d":
        iou_fn = native.iou_3d
    else:
        def iou_fn(a, b):
            return native.rotated_iou_bev(a[:, [0, 1, 3, 4, 6]],
                                          b[:, [0, 1, 3, 4, 6]])

    results: Dict[str, float] = {}
    for ci, cname in enumerate(CLASS_NAMES):
        thr = CLASS_IOU_THRESHOLDS[cname]
        for di, dname in enumerate(DIFFICULTIES):
            pooled_scores, pooled_tp, pooled_ign = [], [], []
            total_gt = 0
            for gt, det in zip(gts, dets):
                g_sel = gt.classes == ci
                g_boxes = gt.boxes7[g_sel]
                g_diff = gt.difficulty[g_sel]
                # ignored: harder than the current difficulty cap, or -1
                g_ignored = (g_diff > di) | (g_diff < 0)
                d_sel = det.classes == ci
                tp, ign, n_gt, s = _match_frame(
                    g_boxes, g_ignored, det.boxes7[d_sel],
                    det.scores[d_sel], iou_fn, thr)
                pooled_scores.append(s)
                pooled_tp.append(tp)
                pooled_ign.append(ign)
                total_gt += n_gt
            ap = _average_precision(
                np.concatenate(pooled_scores) if pooled_scores else
                np.zeros(0),
                np.concatenate(pooled_tp) if pooled_tp else np.zeros(0, bool),
                np.concatenate(pooled_ign) if pooled_ign else
                np.zeros(0, bool),
                total_gt, num_points)
            results[f"{cname}_{metric}_{dname}"] = ap
    return results
