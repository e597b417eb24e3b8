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
    return alpha_t * jnp.power(1.0 - p_t, gamma) * ce


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


def detection_loss(flat_preds: Dict[str, jnp.ndarray],
                   targets: AnchorTargets,
                   cfg: LossConfig) -> Tuple[jnp.ndarray,
                                             Dict[str, jnp.ndarray]]:
    """Total loss over a batch.

    Args:
      flat_preds: {"cls": [B, N], "reg": [B, N, 7], "dir": [B, N, 2]?}
        (dcf.models.head.flatten_predictions layout).
      targets: batched AnchorTargets ([B, ...] leaves).

    Returns:
      (scalar loss, metrics dict).
    """
    cls_logits = flat_preds["cls"].astype(jnp.float32)
    reg_pred = flat_preds["reg"].astype(jnp.float32)

    num_pos = jnp.maximum(jnp.sum(targets.num_pos), 1.0)

    cls_elem = sigmoid_focal_loss(cls_logits, targets.cls_target,
                                  cfg.focal_alpha, cfg.focal_gamma)
    cls_loss = jnp.sum(cls_elem * targets.cls_weight) / num_pos

    pred_s, target_s = add_sin_difference(reg_pred, targets.reg_target)
    reg_elem = smooth_l1(pred_s, target_s, cfg.smooth_l1_beta)
    reg_loss = (jnp.sum(jnp.sum(reg_elem, axis=-1) * targets.reg_weight)
                / num_pos)

    total = cfg.cls_weight * cls_loss + cfg.reg_weight * reg_loss
    metrics = {"loss_cls": cls_loss, "loss_reg": reg_loss,
               "num_pos": jnp.sum(targets.num_pos)}

    if "dir" in flat_preds:
        dir_logits = flat_preds["dir"].astype(jnp.float32)
        logp = jax.nn.log_softmax(dir_logits, axis=-1)
        onehot = jax.nn.one_hot(targets.dir_target, 2)
        dir_elem = -jnp.sum(onehot * logp, axis=-1)
        dir_loss = jnp.sum(dir_elem * targets.reg_weight) / num_pos
        total = total + cfg.dir_weight * dir_loss
        metrics["loss_dir"] = dir_loss

    metrics["loss"] = total
    return total, metrics
