"""Detection losses: focal + smooth-L1 + direction CE (SURVEY.md T1).

Identical math to the reference lineage (RetinaNet focal on anchor
objectness, smooth-L1 on box residuals with the sin-difference angle trick,
cross-entropy on the direction bin), in fp32 accumulation regardless of the
backbone compute dtype.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dcf.config import LossConfig
from dcf.train.targets import AnchorTargets


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float, gamma: float) -> jnp.ndarray:
    """Elementwise focal loss on sigmoid logits."""
    p = jax.nn.sigmoid(logits)
    ce = (jax.nn.softplus(-logits) * targets
          + jax.nn.softplus(logits) * (1.0 - targets))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    # jnp.power with a float exponent lowers to exp/log transcendentals
    # (plus their gradients); integer gamma is just repeated multiply
    focal = (1.0 - p_t)
    if float(gamma) == int(gamma) and 1 <= int(gamma) <= 4:
        w = focal
        for _ in range(int(gamma) - 1):
            w = w * focal
    else:
        w = jnp.power(focal, gamma)
    return alpha_t * w * ce


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def add_sin_difference(reg_pred: jnp.ndarray, reg_target: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Replace the angle channel pair (p, t) by (sin p * cos t, cos p * sin t)
    so the loss sees sin(p - t): yaw becomes pi-periodic (the direction
    classifier disambiguates)."""
    sin_p = jnp.sin(reg_pred[..., 6:7]) * jnp.cos(reg_target[..., 6:7])
    sin_t = jnp.cos(reg_pred[..., 6:7]) * jnp.sin(reg_target[..., 6:7])
    pred = jnp.concatenate([reg_pred[..., :6], sin_p], axis=-1)
    target = jnp.concatenate([reg_target[..., :6], sin_t], axis=-1)
    return pred, target


def _add_sin_difference_cmajor(reg_pred: jnp.ndarray,
                               reg_target: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """add_sin_difference on channel-second [B, 7, N] tensors.

    The training path keeps regression channels SECOND (N on TPU lanes):
    [B, N, 7] f32 tensors are tiled (8, 128), padding 7 -> 128 lanes, so
    each materialized temp in the loss chain costs ~16x the HBM bytes
    (measured 0.95 vs 0.32 ms for one smooth-L1 chain + grad at
    N=422400, scripts/ab_train_step.py loss_layout_bench)."""
    sin_p = jnp.sin(reg_pred[:, 6:7]) * jnp.cos(reg_target[:, 6:7])
    sin_t = jnp.cos(reg_pred[:, 6:7]) * jnp.sin(reg_target[:, 6:7])
    pred = jnp.concatenate([reg_pred[:, :6], sin_p], axis=1)
    target = jnp.concatenate([reg_target[:, :6], sin_t], axis=1)
    return pred, target


def detection_loss_sums(flat_preds: Dict[str, jnp.ndarray],
                        targets: AnchorTargets,
                        cfg: LossConfig) -> Tuple[jnp.ndarray,
                                                  Dict[str, jnp.ndarray]]:
    """UNNORMALIZED loss sums over a (micro-)batch.

    Returns (weighted_sum, sums) where weighted_sum = sum_i w_i * sum_i
    and sums carries the per-component raw sums + num_pos. The
    normalization by global num_pos happens in `detection_loss` (single
    batch) or after accumulation (dcf.train.step gradient accumulation:
    num_pos does not depend on params, so accumulated gradients of the
    sums divided by the global num_pos are exactly the full-batch
    gradients).
    """
    cls_logits = flat_preds["cls"].astype(jnp.float32)
    reg_pred = flat_preds["reg"].astype(jnp.float32)

    cls_elem = sigmoid_focal_loss(cls_logits, targets.cls_target,
                                  cfg.focal_alpha, cfg.focal_gamma)
    cls_sum = jnp.sum(cls_elem * targets.cls_weight)

    # [B, N, 7] pred -> channel-second [B, 7, N]; the one relayout is
    # paid once, every downstream temp (sin-diff, smooth-L1, grads) is
    # then lane-compact (see _add_sin_difference_cmajor).
    reg_pred_cm = jnp.swapaxes(reg_pred, -1, -2)
    pred_s, target_s = _add_sin_difference_cmajor(reg_pred_cm,
                                                  targets.reg_target)
    reg_elem = smooth_l1(pred_s, target_s, cfg.smooth_l1_beta)
    reg_sum = jnp.sum(jnp.sum(reg_elem, axis=1) * targets.reg_weight)

    weighted = cfg.cls_weight * cls_sum + cfg.reg_weight * reg_sum
    sums = {"cls_sum": cls_sum, "reg_sum": reg_sum,
            "num_pos": jnp.sum(targets.num_pos)}

    if "dir" in flat_preds:
        dir_logits = flat_preds["dir"].astype(jnp.float32)
        # 2-class CE in closed form: -log softmax_t(l0, l1)
        # = softplus((1-2t) * (l1-l0)). Keeps every temp on compact
        # [B, N] arrays -- the one_hot/log_softmax formulation
        # materializes [B, N, 2] temps whose 2-wide minor dim pads to
        # 128 TPU lanes (same pathology as the reg-target layout).
        d = dir_logits[..., 1] - dir_logits[..., 0]
        t = targets.dir_target.astype(jnp.float32)
        dir_elem = jax.nn.softplus((1.0 - 2.0 * t) * d)
        dir_sum = jnp.sum(dir_elem * targets.reg_weight)
        weighted = weighted + cfg.dir_weight * dir_sum
        sums["dir_sum"] = dir_sum
    return weighted, sums


def metrics_from_sums(weighted: jnp.ndarray,
                      sums: Dict[str, jnp.ndarray]) -> Tuple[jnp.ndarray,
                                                             Dict]:
    """Normalize accumulated loss sums into (loss, metrics)."""
    num_pos = jnp.maximum(sums["num_pos"], 1.0)
    metrics = {"loss_cls": sums["cls_sum"] / num_pos,
               "loss_reg": sums["reg_sum"] / num_pos,
               "num_pos": sums["num_pos"]}
    if "dir_sum" in sums:
        metrics["loss_dir"] = sums["dir_sum"] / num_pos
    if "slab_overflow" in sums:
        metrics["slab_overflow"] = sums["slab_overflow"]
    total = weighted / num_pos
    metrics["loss"] = total
    return total, metrics


def detection_loss(flat_preds: Dict[str, jnp.ndarray],
                   targets: AnchorTargets,
                   cfg: LossConfig) -> Tuple[jnp.ndarray,
                                             Dict[str, jnp.ndarray]]:
    """Total loss over a batch (normalized by the batch's num_pos).

    Args:
      flat_preds: {"cls": [B, N], "reg": [B, N, 7], "dir": [B, N, 2]?}
        (dcf.models.head.flatten_predictions layout).
      targets: batched AnchorTargets ([B, ...] leaves).

    Returns:
      (scalar loss, metrics dict).
    """
    weighted, sums = detection_loss_sums(flat_preds, targets, cfg)
    return metrics_from_sums(weighted, sums)
