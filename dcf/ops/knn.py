"""Grid-hash K-nearest-neighbor search over BEV space (SURVEY.md M3, 2.4).

The reference class finds per-BEV-pixel nearest lidar points with a host
KDTree (scipy) or dense cdist — both hostile to TPU (dynamic shapes, host
round-trips). The TPU-native design (SURVEY.md "hard parts" #1): bin points
into the BEV grid with a fixed per-cell capacity via one argsort + scatter,
then each pixel searches only its (2r+1)^2 neighboring bins and takes the
K nearest by BEV distance. Everything is static-shape and O(N log N + HWK).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class BinTable(NamedTuple):
    """Fixed-capacity point bins over an H x W grid (index form)."""

    indices: jnp.ndarray   # [H * W, capacity] int32 point idx, clamped
    valid: jnp.ndarray     # [H * W, capacity] bool slot validity
    shape: Tuple[int, int]


class DenseBins(NamedTuple):
    """Fixed-capacity bins holding the point *payload* directly.

    The payload-form avoids the enormous per-pixel index gathers of the
    index-form query (a [H*W*9C]-row gather was the single hottest op of
    the whole model at 43 ms): neighborhoods are assembled by pad+shift
    slicing, which XLA lowers to cheap strided copies instead of gathers.
    """

    data: jnp.ndarray      # [H, W, capacity, D] point payload (0 invalid)
    valid: jnp.ndarray     # [H, W, capacity]




def _rank_within_runs(sorted_vals: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element within its run of equal values ([P] sorted).

    Scan-based replacement for searchsorted(sorted, sorted, "left") --
    searchsorted lowers to a sequential while loop on TPU (~2.6 ms per
    call); this is a log-depth cummax (~microseconds).
    """
    P = sorted_vals.shape[0]
    iota = jnp.arange(P, dtype=jnp.int32)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_vals[1:] != sorted_vals[:-1]])
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, iota, 0))
    return iota - run_start

def bin_points(points_xy: jnp.ndarray, mask: jnp.ndarray,
               origin: Tuple[float, float], cell_size: float,
               grid_hw: Tuple[int, int], capacity: int) -> BinTable:
    """Scatter points into fixed-capacity grid bins.

    Args:
      points_xy: [P, 2] BEV coordinates (metres).
      mask: [P] bool point validity.
      origin: (x0, y0) of grid cell (0, 0).
      cell_size: cell edge length in metres.
      grid_hw: (H, W) cell counts.
      capacity: max points kept per cell (overflow dropped).

    Returns:
      BinTable with sentinel-free clamped indices + validity mask.
    """
    H, W = grid_hw
    P = points_xy.shape[0]
    ix = jnp.floor((points_xy[:, 0] - origin[0]) / cell_size).astype(jnp.int32)
    iy = jnp.floor((points_xy[:, 1] - origin[1]) / cell_size).astype(jnp.int32)
    inb = mask & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
    cell = jnp.where(inb, ix * W + iy, H * W)                 # sentinel H*W

    order = jnp.argsort(cell)                                  # valid first
    sorted_cell = cell[order]
    rank = _rank_within_runs(sorted_cell)
    ok = (rank < capacity) & (sorted_cell < H * W)
    # kept slots are distinct; dropped points get distinct out-of-range
    # indices so unique_indices holds (mode="drop" discards them)
    iota = jnp.arange(P, dtype=jnp.int32)
    flat = jnp.where(ok, sorted_cell * capacity + rank,
                     H * W * capacity + iota)

    table = jnp.full((H * W * capacity,), -1, jnp.int32)
    table = table.at[flat].set(order.astype(jnp.int32), mode="drop",
                               unique_indices=True)
    valid = table >= 0
    indices = jnp.where(valid, table, 0)
    return BinTable(indices.reshape(H * W, capacity),
                    valid.reshape(H * W, capacity), (H, W))


def knn_query_grid(table: BinTable, points_xy: jnp.ndarray,
                   origin: Tuple[float, float], cell_size: float,
                   k: int, radius_cells: int = 1
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K nearest points for every grid cell center.

    Args:
      table: BinTable built at the same resolution.
      points_xy: [P, 2] the binned points.
      k: neighbors per pixel.
      radius_cells: search window half-width in cells (1 -> 3x3).

    Returns:
      idx: [H * W, k] int32 point indices (clamped; check valid).
      valid: [H * W, k] bool.
      dist2: [H * W, k] float32 squared BEV distances (inf where invalid).
    """
    H, W = table.shape
    C = table.indices.shape[1]
    win = 2 * radius_cells + 1

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    cx = origin[0] + (rows.astype(jnp.float32) + 0.5) * cell_size
    cy = origin[1] + (cols.astype(jnp.float32) + 0.5) * cell_size
    centers = jnp.stack([cx, cy], axis=-1).reshape(H * W, 2)

    # neighbor cell ids: [H*W, win*win]
    offs = jnp.arange(-radius_cells, radius_cells + 1, dtype=jnp.int32)
    di = jnp.repeat(offs, win)
    dj = jnp.tile(offs, win)
    ni = rows.reshape(-1, 1) + di[None]
    nj = cols.reshape(-1, 1) + dj[None]
    n_ok = (ni >= 0) & (ni < H) & (nj >= 0) & (nj < W)
    ncell = jnp.where(n_ok, ni * W + nj, 0)

    cand_idx = table.indices[ncell].reshape(H * W, win * win * C)
    cand_valid = (table.valid[ncell]
                  & n_ok[..., None]).reshape(H * W, win * win * C)

    cand_xy = points_xy[cand_idx]                            # [HW, 9C, 2]
    diff = cand_xy - centers[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(cand_valid, d2, jnp.inf)

    neg_d2, sel = jax.lax.top_k(-d2, k)                      # [HW, k]
    idx = jnp.take_along_axis(cand_idx, sel, axis=1)
    valid = jnp.take_along_axis(cand_valid, sel, axis=1)
    return idx, valid, -neg_d2


# --------------------------------------------------------------------------
# Dense (payload) form -- the production path used by the fusion layers.
# --------------------------------------------------------------------------

def bin_points_dense(points: jnp.ndarray, mask: jnp.ndarray,
                     origin: Tuple[float, float], cell_size: float,
                     grid_hw: Tuple[int, int], capacity: int) -> DenseBins:
    """Scatter point payloads into fixed-capacity grid bins.

    Args:
      points: [P, D] rows whose first two columns are BEV (x, y).
      mask: [P] validity.

    Returns:
      DenseBins(data [H, W, capacity, D], valid [H, W, capacity]).
    """
    H, W = grid_hw
    P, D = points.shape
    ix = jnp.floor((points[:, 0] - origin[0]) / cell_size).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - origin[1]) / cell_size).astype(jnp.int32)
    inb = mask & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
    cell = jnp.where(inb, ix * W + iy, H * W)

    order = jnp.argsort(cell)
    sorted_cell = cell[order]
    rank = _rank_within_runs(sorted_cell)
    ok = (rank < capacity) & (sorted_cell < H * W)
    # kept slots are distinct; dropped points get distinct out-of-range
    # indices so the unique_indices hint holds (mode="drop" discards them),
    # letting XLA skip the serialized duplicate-handling scatter path
    iota = jnp.arange(P, dtype=jnp.int32)
    flat = jnp.where(ok, sorted_cell * capacity + rank,
                     H * W * capacity + iota)

    data = jnp.zeros((H * W * capacity, D), points.dtype)
    data = data.at[flat].set(points[order], mode="drop",
                             unique_indices=True)
    valid = jnp.zeros((H * W * capacity,), bool)
    valid = valid.at[flat].set(True, mode="drop", unique_indices=True)
    return DenseBins(data.reshape(H, W, capacity, D),
                     valid.reshape(H, W, capacity))


def knn_select_dense(bins: DenseBins, origin: Tuple[float, float],
                     cell_size: float, k: int, radius_cells: int = 1
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """K nearest point payloads for every grid cell center, gather-free.

    The (2r+1)^2-cell neighborhood is assembled by padding + shifted
    slicing of the dense bin array (strided copies, not gathers); only the
    final K-of-candidates selection uses a small minor-axis
    take_along_axis.

    Returns:
      nbr:   [H, W, k, D] selected point payloads (undefined where invalid).
      valid: [H, W, k] bool.
      dist2: [H, W, k] squared BEV distance (inf where invalid).
    """
    H, W, C, D = bins.data.shape
    r = radius_cells
    win = 2 * r + 1
    pdata = jnp.pad(bins.data, ((r, r), (r, r), (0, 0), (0, 0)))
    pvalid = jnp.pad(bins.valid, ((r, r), (r, r), (0, 0)))
    shifts = [(di, dj) for di in range(win) for dj in range(win)]

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    cx = origin[0] + (rows.astype(jnp.float32) + 0.5) * cell_size
    cy = origin[1] + (cols.astype(jnp.float32) + 0.5) * cell_size
    big = jnp.float32(1e30)

    # Only scalar distances are ever materialized at the full candidate
    # width; the [H, W, win^2*C, D] payload concat this replaces was the
    # hottest op of the model (13 ms of pad/concat HBM churn at stride 2).
    d2_parts = []
    for (di, dj) in shifts:
        sd = pdata[di:di + H, dj:dj + W]                     # [H, W, C, D]
        sv = pvalid[di:di + H, dj:dj + W]
        ddx = sd[..., 0] - cx[..., None]
        ddy = sd[..., 1] - cy[..., None]
        d2_parts.append(jnp.where(sv, ddx * ddx + ddy * ddy, big))
    d2 = jnp.concatenate(d2_parts, axis=-1)                  # [H, W, 9C]

    # Streaming k-pass min selection: lax.top_k (a full sort of the
    # candidate axis) and take_along_axis (minor-axis gather) are both
    # pathologically slow on TPU; k argmin passes + per-shift masked-sum
    # row extraction are plain VPU reductions that XLA fuses into the
    # shifted slices of the bin array.
    slots = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
    nbrs, valids, dists = [], [], []
    for _ in range(k):
        best = jnp.argmin(d2, axis=-1)                       # [H, W]
        hit = slots == best[..., None]                       # [H, W, 9C]
        bd = jnp.min(d2, axis=-1)
        nbr_k = jnp.zeros((H, W, D), bins.data.dtype)
        for s, (di, dj) in enumerate(shifts):
            sd = pdata[di:di + H, dj:dj + W]
            hs = hit[..., s * C:(s + 1) * C]
            nbr_k = nbr_k + jnp.sum(
                jnp.where(hs[..., None], sd, 0), axis=2)
        nbrs.append(nbr_k)
        valids.append(bd < big)
        dists.append(jnp.where(bd < big, bd, jnp.inf))
        d2 = jnp.where(hit, big, d2)
    return (jnp.stack(nbrs, axis=2), jnp.stack(valids, axis=2),
            jnp.stack(dists, axis=2))
