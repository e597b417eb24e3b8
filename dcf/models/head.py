"""Detection head + anchor decode + post-processing (SURVEY.md M5/M6/M7).

Head: small conv stack over the FPN map emitting, per anchor: one class
logit (anchors carry a fixed class, PIXOR/ContFuse style), 7 box residuals,
and 2 direction logits (the sin-difference angle encoding in the loss makes
yaw ambiguous mod pi; the direction classifier resolves it, SECOND-lineage).

Post-processing is one jitted pure function: sigmoid scores -> per-class
static top-K prefilter -> box decode -> on-device rotated NMS -> fixed-size
(padded + mask) detection lists. No host round-trips (BASELINE.json:5).
"""

from __future__ import annotations

import math
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcf.config import Config
from dcf.geometry.boxes import decode_boxes
from dcf.models.layers import ConvNorm
from dcf.ops.nms import rotated_nms_parallel


class DetectionHead(nn.Module):
    """Conv head over the FPN feature map."""

    cfg: Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.backbone.dtype)
        A = cfg.anchors_per_loc
        for _ in range(cfg.head.num_convs):
            x = ConvNorm(cfg.head.head_channels, 3, 1, dtype,
                         quant=cfg.backbone.quant_mode)(x)
        prior = 0.01
        cls = nn.Conv(A, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                      bias_init=nn.initializers.constant(
                          -math.log((1 - prior) / prior)),
                      name="cls")(x.astype(jnp.float32))
        reg = nn.Conv(A * 7, (1, 1), dtype=jnp.float32,
                      param_dtype=jnp.float32, name="reg")(
                          x.astype(jnp.float32))
        out = {"cls": cls, "reg": reg}
        if cfg.head.use_direction_classifier:
            out["dir"] = nn.Conv(A * 2, (1, 1), dtype=jnp.float32,
                                 param_dtype=jnp.float32, name="dir")(
                                     x.astype(jnp.float32))
        return out


def flatten_predictions(preds: Dict[str, jnp.ndarray], cfg: Config
                        ) -> Dict[str, jnp.ndarray]:
    """[B, H, W, A * k] maps -> [B, N, k] in the anchor layout
    (dcf.models.anchors contract: location-major, then per-loc anchor)."""
    B = preds["cls"].shape[0]
    out = {"cls": preds["cls"].reshape(B, -1),
           "reg": preds["reg"].reshape(B, -1, 7)}
    if "dir" in preds:
        out["dir"] = preds["dir"].reshape(B, -1, 2)
    return out


def decode_and_nms(flat: Dict[str, jnp.ndarray], anchors: jnp.ndarray,
                   anchor_classes: jnp.ndarray, cfg: Config
                   ) -> Dict[str, jnp.ndarray]:
    """Batched decode + per-class rotated NMS (jit-safe, static shapes).

    Args:
      flat: {"cls": [B, N], "reg": [B, N, 7], "dir": [B, N, 2]?}.
      anchors: [N, 7]; anchor_classes: [N] int32. Pass these as jit
        *arguments*, never as closed-over constants (axon backend: large
        embedded constants poison runtime performance process-wide).

    Returns:
      {"boxes": [B, D, 7], "scores": [B, D], "classes": [B, D],
       "valid": [B, D]} with D = cfg.head.max_detections.
    """

    use_dir = "dir" in flat

    def one(cls_logits, reg, dir_logits):
        scores = jax.nn.sigmoid(cls_logits)                    # [N]
        k = min(cfg.head.pre_nms_top_k, scores.shape[0])
        C = cfg.num_classes
        D = cfg.head.nms_max_per_class
        class_ids = jnp.arange(C, dtype=anchor_classes.dtype)
        cls_scores = jnp.where(anchor_classes[None, :] == class_ids[:, None],
                               scores[None, :], 0.0)          # [C, N]
        # hardware-accelerated approximate top-k: exact top_k is a full
        # sort of the 200k-anchor axis; a 0.99-recall prefilter before NMS
        # is more than enough (missed candidates are far below threshold).
        # cfg.head.exact_topk flags the exact mode for parity A/B runs.
        if cfg.head.exact_topk:
            top_scores, top_idx = jax.lax.top_k(cls_scores, k)
        else:
            top_scores, top_idx = jax.lax.approx_max_k(
                cls_scores, k, recall_target=0.99)             # [C, k]

        # decode only the C*k selected anchors -- decoding (and the yaw
        # direction fixup) over all 200k anchors costs more than the
        # entire NMS stage
        sel_reg = reg[top_idx]                                 # [C, k, 7]
        sel_anchors = anchors[top_idx]
        top_boxes = decode_boxes(sel_reg, sel_anchors)
        if use_dir:
            dir_label = jnp.argmax(dir_logits[top_idx], axis=-1)
            opp = (top_boxes[..., 6] > 0) != (dir_label == 1)
            yaw = jnp.where(opp, top_boxes[..., 6] + jnp.pi,
                            top_boxes[..., 6])
            yaw = jnp.mod(yaw + jnp.pi, 2 * jnp.pi) - jnp.pi
            top_boxes = jnp.concatenate(
                [top_boxes[..., :6], yaw[..., None]], axis=-1)

        valid = top_scores > cfg.head.score_threshold
        if cfg.pallas_clip:
            # one flat kernel call for all C classes' K x K matrices
            # (vmapping the pallas_call would serialize per class)
            from dcf.ops.pallas.clip_kernel import (
                rotated_intersection_area_pairs)
            bev = top_boxes[..., [0, 1, 3, 4, 6]]              # [C, k, 5]
            aa = jnp.broadcast_to(bev[:, :, None, :], (C, k, k, 5))
            bb = jnp.broadcast_to(bev[:, None, :, :], (C, k, k, 5))
            inter = rotated_intersection_area_pairs(
                aa.reshape(C * k * k, 5),
                bb.reshape(C * k * k, 5)).reshape(C, k, k)
            area = bev[..., 2] * bev[..., 3]
            iou_cls = inter / jnp.maximum(
                area[:, :, None] + area[:, None, :] - inter, 1e-9)
            keep_idx, keep_mask = jax.vmap(
                lambda io, s, v: rotated_nms_parallel(
                    None, s, v, cfg.head.nms_iou_threshold, D,
                    precomputed_iou=io)
            )(iou_cls, top_scores, valid)                      # [C, D]
        else:
            keep_idx, keep_mask = jax.vmap(
                lambda b, s, v: rotated_nms_parallel(
                    b, s, v, cfg.head.nms_iou_threshold, D)
            )(top_boxes[..., [0, 1, 3, 4, 6]], top_scores, valid)
        boxes_cat = jnp.take_along_axis(
            top_boxes, keep_idx[..., None], axis=1).reshape(C * D, 7)
        scores_cat = jnp.take_along_axis(top_scores, keep_idx,
                                         axis=1).reshape(C * D)
        cls_cat = jnp.repeat(class_ids.astype(jnp.int32), D)
        valid_cat = keep_mask.reshape(C * D)
        final_scores, idx = jax.lax.top_k(
            jnp.where(valid_cat, scores_cat, -jnp.inf),
            cfg.head.max_detections)
        return (boxes_cat[idx], jnp.where(valid_cat[idx], final_scores, 0.0),
                cls_cat[idx], valid_cat[idx])

    dir_logits = (flat["dir"] if use_dir
                  else jnp.zeros(flat["cls"].shape + (2,)))
    boxes, scores, classes, valid = jax.vmap(one)(
        flat["cls"], flat["reg"], dir_logits)
    return {"boxes": boxes, "scores": scores, "classes": classes,
            "valid": valid}
