"""3D / rotated-BEV box math in pure jnp (SURVEY.md M6, M7, D6, G1).

Box convention used throughout the framework (lidar frame, right-handed,
x forward / y left / z up):

    box7 = (x, y, z, dx, dy, dz, yaw)

where (x, y, z) is the **geometric center**, dx is the extent along the
heading direction, dy across it, dz vertical, and yaw is CCW rotation
around +z (yaw = 0 means heading along +x).

Everything here is shape-static and jit-safe: rotated polygon intersection
is a vectorized Sutherland-Hodgman clip over fixed-size vertex buffers with
stable-argsort compaction, so it runs on TPU with no host round-trips
(the reference repo class typically bounces rotated IoU to shapely /
cv2 / a CUDA extension on the host -- see SURVEY.md 2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# A 4-gon clipped by 4 half-planes has at most 8 vertices.
_MAX_VERTS = 8


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV corners of rotated boxes.

    Args:
      boxes: [..., 5] of (x, y, dx, dy, yaw).

    Returns:
      [..., 4, 2] corners in CCW order.
    """
    x, y, dx, dy, yaw = jnp.moveaxis(boxes[..., :5], -1, 0)
    # CCW unit square corners scaled by half-extents.
    cx = jnp.stack([dx, -dx, -dx, dx], axis=-1) * 0.5
    cy = jnp.stack([dy, dy, -dy, -dy], axis=-1) * 0.5
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    wx = cx * c - cy * s + x[..., None]
    wy = cx * s + cy * c + y[..., None]
    return jnp.stack([wx, wy], axis=-1)


def boxes3d_corners(boxes7: jnp.ndarray) -> jnp.ndarray:
    """All 8 corners of 3D boxes: [..., 7] -> [..., 8, 3].

    Corner order: bottom face CCW (0-3) then top face CCW (4-7).
    """
    bev = box_corners_bev(boxes7[..., [0, 1, 3, 4, 6]])        # [..., 4, 2]
    z_lo = boxes7[..., 2] - 0.5 * boxes7[..., 5]
    z_hi = boxes7[..., 2] + 0.5 * boxes7[..., 5]
    lo = jnp.concatenate(
        [bev, jnp.broadcast_to(z_lo[..., None, None], bev.shape[:-1] + (1,))],
        axis=-1)
    hi = jnp.concatenate(
        [bev, jnp.broadcast_to(z_hi[..., None, None], bev.shape[:-1] + (1,))],
        axis=-1)
    return jnp.concatenate([lo, hi], axis=-2)


def _cross2(o, a, b):
    """2D cross product (a - o) x (b - o); [..., 2] inputs -> [...]."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _fill_forward(cand, valid):
    """Replace invalid vertices with a copy of their nearest valid
    predecessor (circularly). [..., V, 2], [..., V] -> [..., V, 2].

    Duplicated consecutive vertices are harmless downstream: zero-length
    edges contribute nothing to the shoelace area and can never generate
    half-plane crossings in later clips — this is what lets the clip stay
    sort-free (a stable-argsort compaction here is ~500x slower on TPU).
    The propagation runs directly on the coordinates via associative_scan
    (log-depth selects); an index-based cummax + take_along_axis gather is
    ~30x slower on TPU for minor-axis gathers.
    """
    v2 = jnp.broadcast_to(valid[..., None], cand.shape)

    def combine(a, b):
        va, ka = a
        vb, kb = b
        return jnp.where(kb, vb, va), ka | kb

    filled, anyv = jax.lax.associative_scan((combine), (cand, v2), axis=-2)
    # circular wrap: slots before the first valid vertex take the overall
    # last valid value (== last slot after the forward scan)
    last = filled[..., -1:, :]
    return jnp.where(anyv, filled, last)


def _clip_by_edge(poly, p1, p2):
    """Clip convex polygons by the half-plane left of edge p1 -> p2.

    Sort-free Sutherland-Hodgman: every input vertex emits up to two
    candidates (crossing point, kept vertex); instead of compacting, the
    buffer doubles and dropped slots are filled with duplicates of a valid
    neighbor. Returns (poly[..., 2V, 2], nonempty[...]).

    Args:
      poly: [..., V, 2] vertex buffer (duplicates allowed, in order).
      p1/p2: [..., 2] edge endpoints.
    """
    prev = jnp.roll(poly, 1, axis=-2)
    p1e = p1[..., None, :]
    p2e = p2[..., None, :]
    d_cur = _cross2(p1e, p2e, poly)                              # [..., V]
    d_prev = _cross2(p1e, p2e, prev)
    cur_in = d_cur >= 0.0
    prev_in = d_prev >= 0.0

    denom = d_prev - d_cur
    t = d_prev / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = prev + t[..., None] * (poly - prev)                  # [..., V, 2]

    keep_inter = cur_in != prev_in
    keep_cur = cur_in
    cand = jnp.stack([inter, poly], axis=-2)                     # [...,V,2,2]
    cand_valid = jnp.stack([keep_inter, keep_cur], axis=-1)      # [..., V, 2]
    V = poly.shape[-2]
    cand = cand.reshape(cand.shape[:-3] + (2 * V, 2))
    cand_valid = cand_valid.reshape(cand_valid.shape[:-2] + (2 * V,))
    nonempty = jnp.any(cand_valid, axis=-1)
    return _fill_forward(cand, cand_valid), nonempty


def _polygon_area(poly):
    """Shoelace area; consecutive duplicate vertices contribute zero.
    [..., V, 2] -> [...]."""
    nxt = jnp.roll(poly, -1, axis=-2)
    cross = poly[..., 0] * nxt[..., 1] - poly[..., 1] * nxt[..., 0]
    return 0.5 * jnp.abs(jnp.sum(cross, axis=-1))


def rotated_intersection_area(boxes_a: jnp.ndarray,
                              boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Intersection area of rotated BEV rectangles, elementwise.

    Args:
      boxes_a, boxes_b: [..., 5] of (x, y, dx, dy, yaw), broadcast-compatible.

    Returns:
      [...] intersection areas.
    """
    ca = box_corners_bev(boxes_a)                                # [..., 4, 2]
    cb = box_corners_bev(boxes_b)
    batch = jnp.broadcast_shapes(ca.shape[:-2], cb.shape[:-2])
    poly = jnp.broadcast_to(ca, batch + (4, 2))
    cb = jnp.broadcast_to(cb, batch + (4, 2))
    alive = jnp.ones(batch, bool)
    for k in range(4):
        poly, nonempty = _clip_by_edge(poly, cb[..., k, :],
                                       cb[..., (k + 1) % 4, :])
        alive = alive & nonempty
    return jnp.where(alive, _polygon_area(poly), 0.0)


def rotated_iou_bev(boxes_a: jnp.ndarray,
                    boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU.

    Args:
      boxes_a: [N, 5] (x, y, dx, dy, yaw).
      boxes_b: [M, 5].

    Returns:
      [N, M] IoU matrix.
    """
    inter = rotated_intersection_area(boxes_a[:, None, :],
                                      boxes_b[None, :, :])
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9)


def iou_3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU of box7s: rotated BEV overlap x vertical overlap.

    Args:
      boxes_a: [N, 7], boxes_b: [M, 7].

    Returns:
      [N, M] 3D IoU.
    """
    bev_a = boxes_a[:, [0, 1, 3, 4, 6]]
    bev_b = boxes_b[:, [0, 1, 3, 4, 6]]
    inter_bev = rotated_intersection_area(bev_a[:, None, :], bev_b[None, :, :])
    lo = jnp.maximum(boxes_a[:, None, 2] - 0.5 * boxes_a[:, None, 5],
                     boxes_b[None, :, 2] - 0.5 * boxes_b[None, :, 5])
    hi = jnp.minimum(boxes_a[:, None, 2] + 0.5 * boxes_a[:, None, 5],
                     boxes_b[None, :, 2] + 0.5 * boxes_b[None, :, 5])
    inter_h = jnp.maximum(hi - lo, 0.0)
    inter = inter_bev * inter_h
    vol_a = jnp.prod(boxes_a[:, 3:6], axis=-1)[:, None]
    vol_b = jnp.prod(boxes_b[:, 3:6], axis=-1)[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, 1e-9)


# --------------------------------------------------------------------------
# Anchor encode / decode (SURVEY.md D6 / M6) -- SECOND-style residuals.
# --------------------------------------------------------------------------

def encode_boxes(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Encode gt box7s as regression targets relative to anchor box7s.

    Angle is encoded as the raw difference; the sin-difference trick is
    applied inside the loss (losses.add_sin_difference) together with the
    direction classifier, matching the SECOND-lineage the reference follows.

    Args:
      gt, anchors: [..., 7] box7 arrays (broadcast-compatible).

    Returns:
      [..., 7] encoded deltas.
    """
    xa, ya, za, dxa, dya, dza, ra = jnp.moveaxis(anchors, -1, 0)
    xg, yg, zg, dxg, dyg, dzg, rg = jnp.moveaxis(gt, -1, 0)
    diag = jnp.sqrt(dxa * dxa + dya * dya)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / dza
    dxt = jnp.log(dxg / dxa)
    dyt = jnp.log(dyg / dya)
    dzt = jnp.log(dzg / dza)
    rt = rg - ra
    return jnp.stack([xt, yt, zt, dxt, dyt, dzt, rt], axis=-1)


def encode_boxes_cm(gt_cm: jnp.ndarray, anchors_cm: jnp.ndarray
                    ) -> jnp.ndarray:
    """encode_boxes on channel-MAJOR [7, N] arrays (same math).

    TPU layout rationale: a materialized [N, 7] f32 array is tiled
    (8, 128) on its last two dims, padding the 7-channel minor dim to
    128 lanes (~16x the HBM bytes). The training target path keeps the
    channel axis MAJOR ([7, N], N on lanes) so every temp is compact;
    see dcf.train.targets._finalize and dcf.train.losses.
    """
    xa, ya, za, dxa, dya, dza, ra = anchors_cm
    xg, yg, zg, dxg, dyg, dzg, rg = gt_cm
    diag = jnp.sqrt(dxa * dxa + dya * dya)
    return jnp.stack([(xg - xa) / diag,
                      (yg - ya) / diag,
                      (zg - za) / dza,
                      jnp.log(dxg / dxa),
                      jnp.log(dyg / dya),
                      jnp.log(dzg / dza),
                      rg - ra], axis=0)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of encode_boxes: [..., 7] deltas + anchors -> box7s."""
    xa, ya, za, dxa, dya, dza, ra = jnp.moveaxis(anchors, -1, 0)
    xt, yt, zt, dxt, dyt, dzt, rt = jnp.moveaxis(deltas, -1, 0)
    diag = jnp.sqrt(dxa * dxa + dya * dya)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * dza + za
    dxg = jnp.exp(dxt) * dxa
    dyg = jnp.exp(dyt) * dya
    dzg = jnp.exp(dzt) * dza
    rg = rt + ra
    return jnp.stack([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


def points_in_bev_boxes(points: jnp.ndarray, boxes: jnp.ndarray,
                        margin: float = 0.0) -> jnp.ndarray:
    """Mask of points inside rotated BEV boxes.

    Args:
      points: [N, >=2] (x, y, ...).
      boxes: [M, 5] (x, y, dx, dy, yaw).
      margin: extra half-extent slack in metres.

    Returns:
      [N, M] bool.
    """
    rel = points[:, None, :2] - boxes[None, :, :2]
    c = jnp.cos(boxes[:, 4])[None]
    s = jnp.sin(boxes[:, 4])[None]
    local_x = rel[..., 0] * c + rel[..., 1] * s
    local_y = -rel[..., 0] * s + rel[..., 1] * c
    return ((jnp.abs(local_x) <= boxes[None, :, 2] * 0.5 + margin)
            & (jnp.abs(local_y) <= boxes[None, :, 3] * 0.5 + margin))
