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


def rotated_nms_parallel(boxes_bev: jnp.ndarray, scores: jnp.ndarray,
                         valid: jnp.ndarray, iou_threshold: float,
                         max_out: int,
                         max_rounds: int = None,
                         precomputed_iou: jnp.ndarray = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS computed as iterated independent sets.

    Greedy NMS has a fixpoint characterization: a box is kept iff no kept
    higher-scored box overlaps it. Each round keeps every live box with no
    live dominator and removes everything a newly-kept box suppresses, so
    the sequential 'max_out'-round argmax loop (fixed ~55 us/round of
    while-loop overhead on this backend) collapses to ~chain-depth rounds
    of cheap [K, K] mask reductions over a precomputed IoU matrix.
    Bit-identical to the greedy loop for distinct scores (ties break by
    index, matching argmax).

    Args / returns: same contract as rotated_nms. max_rounds defaults to
    K: every round keeps at least one live box (the top-scored live box
    has no live dominator), so K rounds can never truncate a suppression
    chain and the loop still exits early (via `cond`) in ~chain-depth
    rounds -- the fixed cap exists only to bound the while_loop.
    """
    if precomputed_iou is not None:
        # callers on the Pallas-clip path (dcf.ops.pallas.clip_kernel)
        # compute the matrix in one flat kernel call for all classes
        iou = precomputed_iou
        K = iou.shape[0]
    else:
        K = boxes_bev.shape[0]
        iou = rotated_iou_bev(boxes_bev, boxes_bev)
    if max_rounds is None:
        max_rounds = K
    s = scores.astype(jnp.float32)
    idx = jnp.arange(K)
    higher = (s[None, :] > s[:, None]) | (
        (s[None, :] == s[:, None]) & (idx[None, :] < idx[:, None]))
    dominates = (iou > iou_threshold) & higher       # D[i, j]: j beats i

    def cond(state):
        live, keep, rounds = state
        return (rounds < max_rounds) & jnp.any(live)

    def body(state):
        live, keep, rounds = state
        has_live_dominator = jnp.any(dominates & live[None, :], axis=1)
        is_max = live & ~has_live_dominator
        keep = keep | is_max
        overlaps_kept_max = jnp.any((iou > iou_threshold) & is_max[None, :],
                                    axis=1)
        live = live & ~is_max & ~overlaps_kept_max
        return live, keep, rounds + 1

    live0 = valid
    _, keep, _ = jax.lax.while_loop(
        cond, body, (live0, jnp.zeros((K,), bool), jnp.int32(0)))
    kept_scores = jnp.where(keep, s, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(kept_scores, max_out)
    return top_idx.astype(jnp.int32), top_scores > -jnp.inf


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
