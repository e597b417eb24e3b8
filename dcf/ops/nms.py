"""On-device rotated NMS (SURVEY.md M7).

The reference repo class runs greedy rotated NMS on the host (shapely / cv2
/ a CUDA ext) — the latency sin BASELINE.json:5 orders us to eliminate.
Here the whole thing is jit-compiled: static top-K prefilter, a K x K
rotated-IoU matrix from the vectorized polygon clip, and a `fori_loop`
greedy suppression sweep. No host round-trips, static output shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dcf.geometry.boxes import rotated_iou_bev


def greedy_select(iou: jnp.ndarray, scores: jnp.ndarray,
                  valid: jnp.ndarray, iou_threshold: float,
                  max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS as `max_out` pick-argmax-and-suppress rounds.

    Looping over *output slots* (tens) instead of sweeping all K candidates
    (hundreds) cuts the sequential device-op count ~an order of magnitude —
    each fori_loop iteration on TPU costs fixed overhead, so the loop trip
    count is the latency driver, not the per-trip vector work.

    Args:
      iou: [K, K] pairwise IoU.
      scores: [K] (higher first).
      valid: [K] initial candidate validity.

    Returns:
      (indices[max_out] int32, keep_mask[max_out] bool).
    """
    K = iou.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    live = jnp.where(valid, scores.astype(jnp.float32), neg_inf)

    def body(i, state):
        live, keep_idx, keep_ok = state
        best = jnp.argmax(live).astype(jnp.int32)
        ok = live[best] > neg_inf
        keep_idx = keep_idx.at[i].set(best)
        keep_ok = keep_ok.at[i].set(ok)
        kill = (iou[best] > iou_threshold) | (jnp.arange(K) == best)
        live = jnp.where(ok & kill, neg_inf, live)
        return live, keep_idx, keep_ok

    _, keep_idx, keep_ok = jax.lax.fori_loop(
        0, max_out, body,
        (live, jnp.zeros((max_out,), jnp.int32),
         jnp.zeros((max_out,), bool)))
    return keep_idx, keep_ok


def rotated_nms(boxes_bev: jnp.ndarray, scores: jnp.ndarray,
                valid: jnp.ndarray, iou_threshold: float,
                max_out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy rotated NMS, fully on device, with *lazy* IoU.

    Greedy NMS only ever consults the IoU row of the box it just selected,
    so the K x K rotated-IoU matrix (K^2 polygon clips — seconds of device
    time at K=1024) is never materialized: each of the `max_out` selection
    rounds clips just the selected box against all K candidates (K pairs),
    for max_out * K total pair-clips instead of K^2.

    Args:
      boxes_bev: [K, 5] (x, y, dx, dy, yaw).
      scores: [K].
      valid: [K] bool (padding / score-threshold mask).
      iou_threshold: suppression threshold.
      max_out: static number of survivors to return.

    Returns:
      (indices[max_out] int32 into the K inputs, keep_mask[max_out] bool),
      in descending score order.
    """
    from dcf.geometry.boxes import rotated_intersection_area

    K = boxes_bev.shape[0]
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    live = jnp.where(valid, scores.astype(jnp.float32), neg_inf)
    areas = boxes_bev[:, 2] * boxes_bev[:, 3]

    def cond(state):
        i, live, keep_idx, keep_ok = state
        # early exit once every remaining candidate is suppressed --
        # typical scenes keep far fewer than max_out boxes per class
        return (i < max_out) & (jnp.max(live) > neg_inf)

    def body(state):
        i, live, keep_idx, keep_ok = state
        best = jnp.argmax(live).astype(jnp.int32)
        ok = live[best] > neg_inf
        keep_idx = keep_idx.at[i].set(best)
        keep_ok = keep_ok.at[i].set(ok)
        best_box = jax.lax.dynamic_index_in_dim(boxes_bev, best, 0,
                                                keepdims=True)   # [1, 5]
        inter = rotated_intersection_area(best_box, boxes_bev)   # [K]
        union = areas[best] + areas - inter
        iou = inter / jnp.maximum(union, 1e-9)
        kill = (iou > iou_threshold) | (jnp.arange(K) == best)
        live = jnp.where(ok & kill, neg_inf, live)
        return i + 1, live, keep_idx, keep_ok

    _, _, keep_idx, keep_ok = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), live, jnp.zeros((max_out,), jnp.int32),
         jnp.zeros((max_out,), bool)))
    return keep_idx, keep_ok
