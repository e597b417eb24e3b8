"""On-device anchor target assignment (SURVEY.md D6).

The reference class assigns targets on the host inside DataLoader workers
(SURVEY.md 3.1 hot loop #2). Here assignment is pure jnp running *inside*
the jitted train step.

Matching rule (SECOND-lineage, per-class thresholds):
  positive: IoU >= matched_threshold[anchor]    (same-class gt only)
  negative: IoU <  unmatched_threshold[anchor]
  ignored:  in between (zero loss weight)
  plus force-matching: every valid gt claims its best-IoU anchor.

TPU design: anchors live on a regular [Hd, Wd, A] grid, so a gt box can
only overlap anchors inside a fixed window around its center (max
relevant reach = half the gt diagonal + half the largest anchor diagonal
~= 4.6 m << the 12.8 m window default). Rotated-IoU is therefore clipped
only inside a static [win, win, A] window per gt (dynamic_slice in,
parallel scatter-max/min merge out) instead of against all Hd*Wd*A
anchors -- 34x less polygon-clip work; the dense variant
(assign_targets_dense) remains as the parity reference.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcf.geometry.boxes import encode_boxes_cm, rotated_intersection_area


class AnchorTargets(NamedTuple):
    cls_target: jnp.ndarray    # [N] float32 0/1 (positive objectness)
    cls_weight: jnp.ndarray    # [N] float32 (0 for ignored anchors)
    reg_target: jnp.ndarray    # [7, N] channel-MAJOR encoded residuals
                               # (0 where not pos; N on TPU lanes -- a
                               # [N, 7] layout pads 7 -> 128 lanes)
    reg_weight: jnp.ndarray    # [N] float32 1 for positives
    dir_target: jnp.ndarray    # [N] int32 0/1 direction bin
    num_pos: jnp.ndarray       # [] float32


def _iou_anchors_vs_one(anchors_bev, anchor_area, gt_bev):
    """Rotated BEV IoU of anchors vs a single gt box. [M, 5], [5] -> [M]."""
    inter = rotated_intersection_area(anchors_bev, gt_bev[None, :])
    area_gt = gt_bev[2] * gt_bev[3]
    return inter / jnp.maximum(anchor_area + area_gt - inter, 1e-9)


def _finalize(anchors, matched_thr, unmatched_thr, gt_boxes,
              best_iou, best_gt, gt_best_iou, gt_best_anchor, gt_mask):
    """Shared tail: thresholds, force matching, encoding."""
    N = anchors.shape[0]
    G = gt_boxes.shape[0]
    pos = best_iou >= matched_thr
    neg = best_iou < unmatched_thr

    # Force matching: gt g claims anchor gt_best_anchor[g] if it found any
    # overlap at all; scatter-max so an invalid gt can never clobber a
    # valid forced match (ties resolve to the highest gt index).
    force_ok = gt_mask & (gt_best_iou > 1e-4)
    forced_pos = (jnp.zeros((N,), jnp.int32)
                  .at[gt_best_anchor].max(force_ok.astype(jnp.int32))
                  .astype(bool))
    forced_gt = (jnp.full((N,), -1, jnp.int32)
                 .at[gt_best_anchor]
                 .max(jnp.where(force_ok, jnp.arange(G, dtype=jnp.int32),
                                -1)))
    best_gt = jnp.where(forced_pos & (forced_gt >= 0), forced_gt, best_gt)
    pos = pos | forced_pos
    neg = neg & ~forced_pos

    # Matched-box lookup as an fp32 one-hot matmul on the MXU instead of
    # an N-row gather (TPU row gathers are ~160 ns/row regardless of
    # width; the gather measured 2.4 ms per train step). Exact: every
    # product is gt_value * 1.0 or * 0.0. Channel-MAJOR [7, N] layout
    # throughout the target tail: [N, 7] temps pad 7 -> 128 lanes on TPU
    # (~16x HBM traffic per materialized array, see encode_boxes_cm).
    oh = jax.nn.one_hot(best_gt, G, axis=0, dtype=jnp.float32)  # [G, N]
    matched_cm = gt_boxes.T @ oh                                # [7, N]
    reg_target = encode_boxes_cm(matched_cm, anchors.T)
    reg_target = jnp.where(pos[None, :], reg_target, 0.0)
    dir_target = (matched_cm[6] > 0).astype(jnp.int32)

    cls_target = pos.astype(jnp.float32)
    cls_weight = (pos | neg).astype(jnp.float32)
    reg_weight = pos.astype(jnp.float32)
    num_pos = jnp.sum(reg_weight)
    return AnchorTargets(cls_target, cls_weight, reg_target, reg_weight,
                         dir_target, num_pos)


def assign_targets_dense(anchors: jnp.ndarray, anchor_classes: jnp.ndarray,
                         matched_thr: jnp.ndarray,
                         unmatched_thr: jnp.ndarray,
                         gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                         gt_mask: jnp.ndarray) -> AnchorTargets:
    """Reference implementation: every gt against every anchor.

    Args:
      anchors: [N, 7]; anchor_classes/matched_thr/unmatched_thr: [N].
      gt_boxes: [G, 7] padded; gt_labels: [G]; gt_mask: [G] bool.
    """
    anchors_bev = anchors[:, [0, 1, 3, 4, 6]]
    anchor_area = anchors[:, 3] * anchors[:, 4]

    def one_gt(gt_box, gt_label, gt_valid):
        gt_bev = jnp.stack([gt_box[0], gt_box[1], gt_box[3], gt_box[4],
                            gt_box[6]])
        iou = _iou_anchors_vs_one(anchors_bev, anchor_area, gt_bev)
        return jnp.where(gt_valid & (anchor_classes == gt_label), iou, 0.0)

    # one batched polygon-clip call over all gts; the merge is pure max /
    # argmax (argmax returns the first maximum, matching "first gt wins
    # ties"). Computing per-gt IoU the same vmapped way as the windowed
    # variant keeps the two bitwise comparable.
    iou_all = jax.vmap(one_gt)(gt_boxes, gt_labels, gt_mask)    # [G, N]
    best_iou = jnp.max(iou_all, axis=0)
    best_gt = jnp.argmax(iou_all, axis=0).astype(jnp.int32)
    gt_best_iou = jnp.max(iou_all, axis=1)
    gt_best_anchor = jnp.argmax(iou_all, axis=1).astype(jnp.int32)
    return _finalize(anchors, matched_thr, unmatched_thr, gt_boxes,
                     best_iou, best_gt, gt_best_iou, gt_best_anchor,
                     gt_mask)


def assign_targets(anchors: jnp.ndarray, anchor_classes: jnp.ndarray,
                   matched_thr: jnp.ndarray, unmatched_thr: jnp.ndarray,
                   gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                   gt_mask: jnp.ndarray,
                   grid_shape: Tuple[int, int, int] = None,
                   grid_origin: Tuple[float, float] = None,
                   grid_cell: float = None,
                   window: int = 32,
                   per_class_anchors: int = None,
                   use_pallas_clip: bool = False) -> AnchorTargets:
    """Windowed single-frame target assignment.

    Args:
      anchors: [N, 7] laid out as a [Hd, Wd, A] grid (dcf.models.anchors);
      grid_shape/grid_origin/grid_cell: that grid's geometry. When omitted,
      falls back to the dense reference implementation.
      per_class_anchors: static anchors-per-class count (A // num_classes)
        when every class has the same rotation count; enables the
        class-restricted window fast path.
      use_pallas_clip: window IoUs via the VMEM-resident Pallas clip
        kernel (TPU only; parity-tested against the jnp clip).
    """
    if grid_shape is None:
        return assign_targets_dense(anchors, anchor_classes, matched_thr,
                                    unmatched_thr, gt_boxes, gt_labels,
                                    gt_mask)
    Hd, Wd, A = grid_shape
    N = anchors.shape[0]
    G = gt_boxes.shape[0]
    win = min(window, Hd, Wd)

    # A gt only matches same-class anchors (the IoU of every other pair is
    # masked to zero), and the per-location anchor axis is class-major
    # (dcf.models.anchors layout contract): slice each gt's window down to
    # its OWN class's rotations with a dynamic class offset -- 3x less
    # polygon-clip work for 3 classes, bit-identical results.
    # per_class_anchors is static (from config, see make_train_step);
    # None means classes have unequal rotation counts -> all-A windows.
    per_class_equal = per_class_anchors is not None
    Ay = per_class_anchors if per_class_equal else A
    M = win * win * Ay

    grid_anchors = anchors.reshape(Hd, Wd, A, 7)

    # window origins (cells), clipped so every slice stays in bounds
    oy = jnp.clip(((gt_boxes[:, 0] - grid_origin[0]) / grid_cell)
                  .astype(jnp.int32) - win // 2, 0, Hd - win)       # [G]
    ox = jnp.clip(((gt_boxes[:, 1] - grid_origin[1]) / grid_cell)
                  .astype(jnp.int32) - win // 2, 0, Wd - win)
    if per_class_equal:
        cls_off = jnp.clip(gt_labels * Ay, 0, A - Ay)               # [G]
    else:
        cls_off = jnp.zeros((G,), jnp.int32)

    # All G window-IoU computations run in ONE batched polygon-clip call
    # (the expensive part); a scan over gts paid ~0.5 ms of tiny-kernel
    # launches *per gt* for the same total clip work. The clip runs on a
    # FLAT [G*M] pair axis: a [G, M, verts, 2] corner tensor inside a
    # vmapped clip trips an XLA:TPU fusion-pass CHECK (fusion_util
    # TransformWindow "Loop will not make progress") when fused into the
    # surrounding train step.
    grid_classes = anchor_classes.reshape(Hd, Wd, A)

    def gather_window(o_y, o_x, o_a):
        wa = jax.lax.dynamic_slice(
            grid_anchors, (o_y, o_x, o_a, 0),
            (win, win, Ay, 7)).reshape(M, 7)
        wc = jax.lax.dynamic_slice(
            grid_classes, (o_y, o_x, o_a), (win, win, Ay)).reshape(M)
        return wa, wc

    w_anchors, w_classes = jax.vmap(gather_window)(oy, ox, cls_off)
    flat_a = w_anchors.reshape(G * M, 7)                     # [G*M, 7]
    a_bev = flat_a[:, [0, 1, 3, 4, 6]]
    a_area = flat_a[:, 3] * flat_a[:, 4]
    gt_bev = gt_boxes[:, [0, 1, 3, 4, 6]]                    # [G, 5]
    g_bev = jnp.broadcast_to(gt_bev[:, None, :],
                             (G, M, 5)).reshape(G * M, 5)
    if use_pallas_clip:
        from dcf.ops.pallas.clip_kernel import (
            rotated_intersection_area_pairs)
        inter = rotated_intersection_area_pairs(a_bev, g_bev)
    else:
        inter = rotated_intersection_area(a_bev, g_bev)      # [G*M]
    g_area = g_bev[:, 2] * g_bev[:, 3]
    iou_flat = inter / jnp.maximum(a_area + g_area - inter, 1e-9)
    # class-restricted windows contain only same-class anchors, but
    # cls_off clamping can leak neighbors for out-of-range labels, and the
    # all-A fallback mixes classes -- mask in both cases (cheap)
    keep = gt_mask[:, None] & (w_classes == gt_labels[:, None])
    iou_all = jnp.where(keep, iou_flat.reshape(G, M), 0.0)   # [G, M]

    # per-gt best anchor (force matching), fully parallel
    flat = jnp.argmax(iou_all, axis=1)                           # [G]
    wy, rem = jnp.divmod(flat, win * Ay)
    wx, wa = jnp.divmod(rem, Ay)
    gt_best_anchor = (((oy + wy) * Wd + (ox + wx)) * A + cls_off
                      + wa).astype(jnp.int32)
    gt_best_iou = jnp.max(iou_all, axis=1)

    # Parallel max-merge of the windows into the global grid (replaces a
    # G-step sequential dynamic-slice/update chain that cost ~6 ms of
    # serialized small ops per frame at B=2):
    #   1. scatter-max the window IoUs onto the flat anchor axis;
    #   2. block-gather each window's final best back (contiguous
    #      dynamic_slice per gt, the same gather_window pattern as above
    #      -- NOT an elementwise gather, which is ~160 ns/offset on TPU);
    #   3. scatter-MIN the gt index among pairs achieving that max.
    # Tie semantics are exactly the sequential loop's "first gt wins":
    # min g among equal maxima == ascending-g merge with strict `>`.
    iou_w = iou_all.reshape(G, win, win, Ay)
    wy_i, wx_i, wa_i = jnp.meshgrid(
        jnp.arange(win, dtype=jnp.int32), jnp.arange(win, dtype=jnp.int32),
        jnp.arange(Ay, dtype=jnp.int32), indexing="ij")
    idx = (((oy[:, None, None, None] + wy_i) * Wd
            + (ox[:, None, None, None] + wx_i)) * A
           + cls_off[:, None, None, None] + wa_i)          # [G,win,win,Ay]
    best_iou_g = (jnp.zeros((N,), jnp.float32)
                  .at[idx.reshape(-1)].max(iou_all.reshape(-1)))
    best_w = jax.vmap(lambda o_y, o_x, o_a: jax.lax.dynamic_slice(
        best_iou_g.reshape(Hd, Wd, A), (o_y, o_x, o_a),
        (win, win, Ay)))(oy, ox, cls_off)                  # [G,win,win,Ay]
    is_best = (iou_w >= best_w) & (iou_w > 0.0)
    g_ids = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[:, None, None, None], idx.shape)
    best_gt_g = (jnp.full((N,), G, jnp.int32)
                 .at[idx.reshape(-1)].min(
                     jnp.where(is_best, g_ids, G).reshape(-1)))
    best_gt_g = jnp.where(best_gt_g < G, best_gt_g, 0)
    return _finalize(anchors, matched_thr, unmatched_thr, gt_boxes,
                     best_iou_g, best_gt_g,
                     gt_best_iou, gt_best_anchor, gt_mask)


def assign_targets_batch(anchors, anchor_classes, matched_thr, unmatched_thr,
                         gt_boxes, gt_labels, gt_mask,
                         grid_shape=None, grid_origin=None, grid_cell=None,
                         window: int = 32,
                         per_class_anchors: int = None,
                         use_pallas_clip: bool = False) -> AnchorTargets:
    """Batched over frames: gt_* have a leading batch dim."""
    return jax.vmap(
        lambda b, l, m: assign_targets(
            anchors, anchor_classes, matched_thr, unmatched_thr, b, l, m,
            grid_shape=grid_shape, grid_origin=grid_origin,
            grid_cell=grid_cell, window=window,
            per_class_anchors=per_class_anchors,
            use_pallas_clip=use_pallas_clip)
    )(gt_boxes, gt_labels, gt_mask)
