"""Pallas TPU kernel for pairwise rotated-rectangle intersection areas
(SURVEY.md M7 / 2.4 "rotated IoU native").

The jnp Sutherland-Hodgman clip (dcf.geometry.boxes) is exact and
vectorized, but XLA materializes every doubling level of its vertex
buffers to HBM ([pairs, 64, 2] f32 at the last level): at NMS scale
(3 classes x 256^2 pairs) that is ~100 MB of traffic per call and was
the single largest non-conv cost of both inference (rotated NMS) and the
train step (target-assigner window IoUs). This kernel runs the SAME
algorithm with the vertex buffers held in VMEM/vector registers -- the
only HBM traffic is the [pairs, 10] box params in and the [pairs] areas
out.

Layout: pairs ride the (sublane, lane) axes as [TB, 128] tiles; the
vertex axis is unrolled in Python (lists of [TB, 128] arrays), so every
step is a full-width VPU op. The math mirrors `_clip_by_edge` /
`_fill_forward` / `_polygon_area` of dcf.geometry.boxes op-for-op
(including the sort-free candidate doubling 4 -> 64 and the
associative-scan fill-forward, here a Hillis-Steele ladder of selects);
tests/test_pallas.py checks parity against the jnp twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _corners(x, y, dx, dy, yaw):
    """CCW corners, matching dcf.geometry.boxes.box_corners_bev."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    cxs = (0.5 * dx, -0.5 * dx, -0.5 * dx, 0.5 * dx)
    cys = (0.5 * dy, 0.5 * dy, -0.5 * dy, -0.5 * dy)
    px = [cx * c - cy * s + x for cx, cy in zip(cxs, cys)]
    py = [cx * s + cy * c + y for cx, cy in zip(cxs, cys)]
    return px, py


def _clip_kernel(fields_ref, out_ref):
    f = lambda i: fields_ref[0, i]                      # [TB, 128] f32
    pax, pay = _corners(f(0), f(1), f(2), f(3), f(4))   # poly = corners(a)
    pbx, pby = _corners(f(5), f(6), f(7), f(8), f(9))   # clip edges from b

    polyx, polyy = list(pax), list(pay)
    alive = None
    for k in range(4):
        p1x, p1y = pbx[k], pby[k]
        ex = pbx[(k + 1) % 4] - p1x
        ey = pby[(k + 1) % 4] - p1y
        V = len(polyx)
        # signed distance to the half-plane left of edge p1 -> p2
        d = [ex * (polyy[v] - p1y) - ey * (polyx[v] - p1x)
             for v in range(V)]
        candx, candy, candv = [], [], []
        for v in range(V):
            pv = (v - 1) % V
            d_cur, d_prev = d[v], d[pv]
            cur_in = d_cur >= 0.0
            prev_in = d_prev >= 0.0
            denom = d_prev - d_cur
            safe = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
            t = d_prev / safe
            candx += [polyx[pv] + t * (polyx[v] - polyx[pv]), polyx[v]]
            candy += [polyy[pv] + t * (polyy[v] - polyy[pv]), polyy[v]]
            candv += [cur_in != prev_in, cur_in]
        nonempty = candv[0]
        for v in range(1, 2 * V):
            nonempty = nonempty | candv[v]
        alive = nonempty if alive is None else alive & nonempty
        # fill-forward: inclusive "last valid value" scan (Hillis-Steele)
        vx, vy, has = list(candx), list(candy), list(candv)
        n = 2 * V
        s = 1
        while s < n:
            nvx, nvy, nhas = list(vx), list(vy), list(has)
            for v in range(s, n):
                nvx[v] = jnp.where(has[v], vx[v], vx[v - s])
                nvy[v] = jnp.where(has[v], vy[v], vy[v - s])
                nhas[v] = has[v] | has[v - s]
            vx, vy, has = nvx, nvy, nhas
            s *= 2
        # circular wrap: slots before the first valid take the last value
        lastx, lasty = vx[n - 1], vy[n - 1]
        polyx = [jnp.where(has[v], vx[v], lastx) for v in range(n)]
        polyy = [jnp.where(has[v], vy[v], lasty) for v in range(n)]

    n = len(polyx)
    acc = None
    for v in range(n):
        w = (v + 1) % n
        term = polyx[v] * polyy[w] - polyy[v] * polyx[w]
        acc = term if acc is None else acc + term
    area = 0.5 * jnp.abs(acc)
    out_ref[0] = jnp.where(alive, area, 0.0)


@functools.partial(jax.jit, static_argnames=("tile_sublanes", "interpret"))
def rotated_intersection_area_pairs(boxes_a: jnp.ndarray,
                                    boxes_b: jnp.ndarray,
                                    tile_sublanes: int = 8,
                                    interpret: bool = False) -> jnp.ndarray:
    """Elementwise intersection areas of rotated BEV rectangle pairs.

    Args:
      boxes_a, boxes_b: [P, 5] float32 of (x, y, dx, dy, yaw); the
        polygon of `a` is clipped by the edges of `b` (same convention
        as dcf.geometry.boxes.rotated_intersection_area).

    Returns:
      [P] float32 areas.
    """
    P = boxes_a.shape[0]
    TB = tile_sublanes
    per = TB * 128
    nb = max((P + per - 1) // per, 1)
    p_pad = nb * per
    fields = jnp.concatenate(
        [boxes_a.astype(jnp.float32).T, boxes_b.astype(jnp.float32).T],
        axis=0)                                          # [10, P]
    fields = jnp.pad(fields, ((0, 0), (0, p_pad - P)))
    fields = jnp.transpose(
        fields.reshape(10, nb, TB, 128), (1, 0, 2, 3))   # [nb,10,TB,128]
    out = pl.pallas_call(
        _clip_kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, 10, TB, 128),
                               lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, TB, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, TB, 128), jnp.float32),
        interpret=interpret,
    )(fields)
    return out.reshape(p_pad)[:P]


def rotated_iou_bev_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray,
                           interpret: bool = False) -> jnp.ndarray:
    """Pairwise rotated BEV IoU matrix via the pairs kernel.

    Args:
      boxes_a: [N, 5]; boxes_b: [M, 5].

    Returns:
      [N, M] IoU.
    """
    N, M = boxes_a.shape[0], boxes_b.shape[0]
    aa = jnp.broadcast_to(boxes_a[:, None, :], (N, M, 5)).reshape(N * M, 5)
    bb = jnp.broadcast_to(boxes_b[None, :, :], (N, M, 5)).reshape(N * M, 5)
    inter = rotated_intersection_area_pairs(aa, bb,
                                            interpret=interpret)
    inter = inter.reshape(N, M)
    area_a = (boxes_a[:, 2] * boxes_a[:, 3])[:, None]
    area_b = (boxes_b[:, 2] * boxes_b[:, 3])[None, :]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)
