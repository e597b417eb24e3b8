"""On-device anchor target assignment (SURVEY.md D6).

The reference class assigns targets on the host inside DataLoader workers
(SURVEY.md 3.1 hot loop #2). Here assignment is pure jnp running *inside*
the jitted train step: rotated-BEV IoU between the static anchor grid and
the (padded, masked) gt boxes, scanned over gt slots to bound memory
(N_anchors x 8-vertex polygon buffers per scan step, SURVEY.md hard-parts).

Matching rule (SECOND-lineage, per-class thresholds):
  positive: IoU >= matched_threshold[anchor]    (same-class gt only)
  negative: IoU <  unmatched_threshold[anchor]
  ignored:  in between (zero loss weight)
  plus force-matching: every valid gt claims its best-IoU anchor.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from dcf.geometry.boxes import encode_boxes, rotated_intersection_area


class AnchorTargets(NamedTuple):
    cls_target: jnp.ndarray    # [N] float32 0/1 (positive objectness)
    cls_weight: jnp.ndarray    # [N] float32 (0 for ignored anchors)
    reg_target: jnp.ndarray    # [N, 7] encoded residuals (0 where not pos)
    reg_weight: jnp.ndarray    # [N] float32 1 for positives
    dir_target: jnp.ndarray    # [N] int32 0/1 direction bin
    num_pos: jnp.ndarray       # [] float32


def _iou_anchors_vs_one(anchors_bev, anchor_area, gt_bev):
    """Rotated BEV IoU of all anchors vs a single gt box. [N, 5], [5] -> [N]."""
    inter = rotated_intersection_area(anchors_bev, gt_bev[None, :])
    area_gt = gt_bev[2] * gt_bev[3]
    return inter / jnp.maximum(anchor_area + area_gt - inter, 1e-9)


def assign_targets(anchors: jnp.ndarray, anchor_classes: jnp.ndarray,
                   matched_thr: jnp.ndarray, unmatched_thr: jnp.ndarray,
                   gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                   gt_mask: jnp.ndarray) -> AnchorTargets:
    """Single-frame target assignment.

    Args:
      anchors: [N, 7]; anchor_classes/matched_thr/unmatched_thr: [N].
      gt_boxes: [G, 7] padded; gt_labels: [G]; gt_mask: [G] bool.
    """
    N = anchors.shape[0]
    anchors_bev = anchors[:, [0, 1, 3, 4, 6]]
    anchor_area = anchors[:, 3] * anchors[:, 4]

    def step(carry, gt):
        best_iou, best_gt = carry
        gt_box, gt_label, gt_valid, gt_idx = gt
        gt_bev = jnp.stack([gt_box[0], gt_box[1], gt_box[3], gt_box[4],
                            gt_box[6]])
        iou = _iou_anchors_vs_one(anchors_bev, anchor_area, gt_bev)
        iou = jnp.where(gt_valid & (anchor_classes == gt_label), iou, 0.0)
        better = iou > best_iou
        best_iou = jnp.where(better, iou, best_iou)
        best_gt = jnp.where(better, gt_idx, best_gt)
        # best anchor for this gt (for force matching)
        gt_best_iou = jnp.max(iou)
        gt_best_anchor = jnp.argmax(iou)
        return (best_iou, best_gt), (gt_best_iou, gt_best_anchor)

    G = gt_boxes.shape[0]
    (best_iou, best_gt), (gt_best_iou, gt_best_anchor) = jax.lax.scan(
        step,
        (jnp.zeros((N,), jnp.float32), jnp.zeros((N,), jnp.int32)),
        (gt_boxes, gt_labels, gt_mask, jnp.arange(G, dtype=jnp.int32)))

    pos = best_iou >= matched_thr
    neg = best_iou < unmatched_thr

    # Force matching: gt g claims anchor gt_best_anchor[g] if it found any
    # overlap at all; later gts win scatter ties (same as sequential impls).
    force_ok = gt_mask & (gt_best_iou > 1e-4)
    forced_pos = (jnp.zeros((N,), jnp.int32)
                  .at[gt_best_anchor].max(force_ok.astype(jnp.int32))
                  .astype(bool))
    # scatter-max so an invalid gt can never clobber a valid forced match;
    # ties resolve to the highest gt index (deterministic)
    forced_gt = (jnp.full((N,), -1, jnp.int32)
                 .at[gt_best_anchor]
                 .max(jnp.where(force_ok, jnp.arange(G, dtype=jnp.int32),
                                -1)))
    best_gt = jnp.where(forced_pos & (forced_gt >= 0), forced_gt, best_gt)
    pos = pos | forced_pos
    neg = neg & ~forced_pos

    matched = gt_boxes[best_gt]                               # [N, 7]
    reg_target = encode_boxes(matched, anchors)
    reg_target = jnp.where(pos[:, None], reg_target, 0.0)
    dir_target = (matched[:, 6] > 0).astype(jnp.int32)

    cls_target = pos.astype(jnp.float32)
    cls_weight = (pos | neg).astype(jnp.float32)
    reg_weight = pos.astype(jnp.float32)
    num_pos = jnp.sum(reg_weight)
    return AnchorTargets(cls_target, cls_weight, reg_target, reg_weight,
                         dir_target, num_pos)


def assign_targets_batch(anchors, anchor_classes, matched_thr, unmatched_thr,
                         gt_boxes, gt_labels, gt_mask) -> AnchorTargets:
    """Batched over frames: gt_* have a leading batch dim."""
    return jax.vmap(
        lambda b, l, m: assign_targets(anchors, anchor_classes, matched_thr,
                                       unmatched_thr, b, l, m)
    )(gt_boxes, gt_labels, gt_mask)
