"""Fused continuous-fusion Pallas TPU kernel (SURVEY.md M3/M6 kernel #2;
BASELINE.json:5 "per-BEV-pixel KNN, calibrated projection into the image
plane, bilinear gather of camera features, and the geometric-offset MLP --
fuse into single Pallas kernels at each backbone scale").

One kernel per scale does, per BEV pixel:
  1. streaming KNN over the binned lidar points (insertion cascade, as in
     knn_kernel.py) -- selects K neighbors with payload (x, y, z, gidx)
  2. geometric-offset MLP first layer: g1 = Wg @ (dx, dy, z, dist) + bg
  3. camera-feature first layer z1[gidx]: the per-point image features
     (projected + bilinearly gathered + projected to hidden width in XLA,
     where the MXU convs already live) are *selected in-kernel with local
     one-hot matmuls* against a VMEM-resident slab of the z1 table --
     the TPU-native replacement for the XLA per-pair row gather that was
     the top profiled cost of round 1 (~3.6 ms at stride 2)
  4. relu(z1 + g1), masked sum over K -> hidden accumulator + valid count

The z1 slab trick: points are pre-sorted by fine-BEV-grid row (row-major
cell id), so the neighbors of any row-slab of pixels occupy one contiguous
index range of the z1 table. The table is kept FEATURE-MAJOR [B, hid, P]
so every dynamic slab/window slice runs along the lane (point) axis in
128-aligned strides -- Mosaic rejects dynamic lane slices of the hid=64
dim (not a multiple of the 128-lane tiling). Each program DMAs its range
([hid, capz] bf16) into VMEM; selection contracts a one-hot(lidx) against
a per-ROW window of the slab on the MXU -- each BEV row only reaches
points in (1 + 2r) of the slab's (tile_rows + 2r) fine rows
(`fusion_windows`), so the one-hot runs `capr` ~ 3x narrower than the
slab, cutting the kernel's dominant matmul FLOPs by the same factor in
both the forward and the backward.

The output layer (Dense over the hidden sum) stays in XLA: sum-over-K and
a linear layer commute, except the per-pair bias, which is restored as
`count * bias` from the kernel's count channel -- bit-for-bit the paper's
per-pair MLP semantics at a fraction of the FLOPs.

Training: a custom VJP whose backward kernel reads the forward's stashed
selections (no cascade recompute) and computes d_z1 with the *transposed*
one-hot matmuls (a segment-sum on the MXU, row-windowed like the
forward), replacing the XLA scatter-add that cost ~25 ms of the round-1
train step.

Parity: tests/test_pallas.py compares against `fused_fusion_reference`
(the jnp twin used on CPU) in interpret mode, values and gradients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcf.ops.knn import DenseBins, knn_select_dense

_BIG = 1e30
_D = 2          # payload planes: packed(bf16 dx | bf16 dy),
#                                 packed(bf16 z  | gidx + 1)
# Plane layout note: the KERNEL's field planes pack the whole
# (x, y, z, gidx) payload into TWO f32 words per slot:
#   plane 0: bf16(x - cell_center_x) << 16 | bf16(y - cell_center_y)
#   plane 1: bf16(z) << 16 | (gidx + 1)   (0 == "empty slot", so
#            validity rides this word; exact while gidx + 1 < 65536,
#            asserted at binning)
# x/y are stored as offsets from the point's OWN cell center, so bf16's
# 8-bit mantissa loses at most cell_size * 2^-9 (~0.2 mm at the finest
# scale, ~1.6 mm at stride 16) instead of the ~0.1 m it would lose on
# absolute coordinates. The kernel reconstructs the absolute position
# exactly as cell_center + offset -- it knows each candidate's cell
# from the plane position -- with the SAME f32 expression the jnp twin
# uses, and the twin quantizes x/y/z identically
# (fused_fusion_reference), so kernel-vs-twin parity stays exact.
# Each fold cut the binning scatter's update count, the plane DMA, and
# the scr scratch (5 planes in round 3 -> 4 in round 4 -> 3 -> 2 now;
# the scatter cost tracks updates, not plane size -- BASELINE.md op
# budgets). DenseBins (the jnp twin's input) still carries the raw
# (x, y, z, gidx) payload; the pack happens in _scatter_planes /
# build_planes, the matching quantization in fused_fusion_reference.


def _pack_zg(z: jnp.ndarray, gidx_plus1: jnp.ndarray) -> jnp.ndarray:
    """f32 z + int gidx+1 (0 == empty) -> one packed f32 word."""
    zb = jax.lax.bitcast_convert_type(
        z.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    w = (zb << 16) | (gidx_plus1.astype(jnp.uint32) & 0xFFFF)
    return jax.lax.bitcast_convert_type(w, jnp.float32)


def _pack_xy(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """Two f32 cell-center offsets -> one packed f32 word
    (bf16(dx) high 16 bits, bf16(dy) low 16)."""
    xb = jax.lax.bitcast_convert_type(
        dx.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    yb = jax.lax.bitcast_convert_type(
        dy.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type((xb << 16) | yb, jnp.float32)


def quantize_payload_xyz(data: jnp.ndarray, origin, cell_size: float
                         ) -> jnp.ndarray:
    """Apply the packed-plane bf16 quantization to a DenseBins payload
    [H, W, C, 4] -- the jnp-twin half of the _D layout note.

    x/y are rounded through bf16 RELATIVE to their bin's cell center
    (the f32 center formula matches the kernel's reconstruction
    bit-for-bit), z through plain bf16."""
    H, W = data.shape[:2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ccx = (origin[0] + (rows.astype(jnp.float32) + 0.5)
           * cell_size)[..., None]                            # [H, W, 1]
    ccy = (origin[1] + (cols.astype(jnp.float32) + 0.5)
           * cell_size)[..., None]
    f32 = jnp.float32

    def q(v):
        return v.astype(jnp.bfloat16).astype(f32)

    return jnp.stack(
        [ccx + q(data[..., 0].astype(f32) - ccx),
         ccy + q(data[..., 1].astype(f32) - ccy),
         q(data[..., 2].astype(f32)),
         data[..., 3].astype(f32)], axis=-1)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _roll2(x, di, dj):
    """x[i, j] <- x[i + di, j + dj] (circular; wraps land in zero padding).
    pltpu.roll needs non-negative shifts: left-shift d == right-shift
    size - d."""
    if di:
        x = pltpu.roll(x, x.shape[0] - di, 0)
    if dj:
        x = pltpu.roll(x, x.shape[1] - dj, 1)
    return x


def _plane_geometry(H: int, W: int, r: int, tile_rows: int):
    """Shared tiling arithmetic for the slab-DMA'd field planes."""
    TH = min(tile_rows, _round_up(H, 8))
    H_eff = _round_up(H, TH)
    TS = _round_up(TH + 2 * r, 8)
    WP = _round_up(W + 2 * r, 128)
    RP = (H_eff // TH - 1) * TH + TS
    return TH, H_eff, TS, WP, RP


def bin_points_planes(points: jnp.ndarray, mask: jnp.ndarray,
                      origin, cell_size: float, grid_hw,
                      capacity: int, r: int, tile_rows: int,
                      presorted: bool = False,
                      fine_ratio: int = 1,
                      sort_valid=None) -> jnp.ndarray:
    """Scatter point payloads DIRECTLY into the kernel's plane layout.

    Equivalent to `build_planes(bin_points_dense(...))` (parity-tested)
    without materializing the [H, W, C, D] bins + the [B, D, C, H, W]
    transpose that XLA copies through HBM per fusion scale: one flat
    scalar scatter writes every field at its final [_D, C, RP, WP]
    position (plane 2 packs bf16 z | gidx + 1, 0 marking empty -- the
    _D note).

    Args:
      points: [P, 4] payload rows (x, y, z, gidx).
      mask: [P] validity.

    Returns:
      [_D, C, RP, WP] float32 planes.
    """
    from dcf.ops.knn import _rank_within_runs
    H, W = grid_hw
    P, D = points.shape
    C = capacity
    TH, H_eff, TS, WP, RP = _plane_geometry(H, W, r, tile_rows)
    if fine_ratio > 1:
        # Sort-free COARSE-scale binning: the caller guarantees points
        # arrive grouped by fine-grid cell (row-major; the one fine sort
        # of sort_points_for_fusion). Fine cells nest in this scale's
        # cells, so rank-within-coarse-cell -- the only thing the
        # per-scale stable argsort was computing -- decomposes into
        #   rank_fine   (arrival rank within own fine cell, seg-scan)
        # + valid counts of the coarse cell's EARLIER fine cells
        # (row-major), read from cumsum images of a per-fine-cell count
        # raster. Replaces the [P] argsort + payload gather per coarse
        # scale (~0.6 ms/frame each on v5e) with O(P) scans + 4 tiny
        # image gathers. Slot assignment is bit-identical to the stable
        # argsort of fine-sorted input (same arrival order per cell).
        ix, iy, rank, inb = _coarse_rank_presorted(
            points, mask, origin, cell_size, (H, W), fine_ratio,
            sort_valid)
        ok = (rank < C) & inb
        return _scatter_planes(points, ok, rank, ix, iy, C, RP, WP, D, P,
                               r, origin, cell_size)
    ix = jnp.floor((points[:, 0] - origin[0]) / cell_size).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - origin[1]) / cell_size).astype(jnp.int32)
    inb = mask & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
    cell = jnp.where(inb, ix * W + iy, H * W)

    if presorted:
        # Caller guarantees points arrive grouped by this scale's cells
        # (true at the finest fusion scale: its cells ARE the fine
        # sort's cells) -- skips a [P] argsort per scale on the hot
        # path. `mask` (image-visibility) does NOT follow the grouping,
        # so a plain run-rank over `cell` would restart at masked
        # points and collide slots; rank masked-aware instead: count
        # only valid points within each contiguous cell group
        # (segmented exclusive cumsum). Identical slot assignment to
        # the stable-argsort path, which also keeps valid points in
        # arrival order.
        group = jnp.where((ix >= 0) & (ix < H) & (iy >= 0) & (iy < W),
                          ix * W + iy, H * W)
        start = jnp.concatenate(
            [jnp.ones((1,), bool), group[1:] != group[:-1]])
        valid32 = inb.astype(jnp.int32)

        def seg_op(a, b):
            return (a[0] | b[0],
                    jnp.where(b[0], b[1], a[1] + b[1]))

        _, incl = jax.lax.associative_scan(seg_op, (start, valid32))
        rank = incl - valid32
        sorted_cell = jnp.where(inb, group, H * W)
        six = ix
        siy = iy
        spoints = points
        ok = (rank < C) & (sorted_cell < H * W)
    else:
        order = jnp.argsort(cell)
        sorted_cell = cell[order]
        six = ix[order]
        siy = iy[order]
        spoints = points[order]
        rank = _rank_within_runs(sorted_cell)
        ok = (rank < C) & (sorted_cell < H * W)
    return _scatter_planes(spoints, ok, rank, six, siy, C, RP, WP, D, P,
                           r, origin, cell_size)


def bin_points_planes_ranked(points: jnp.ndarray, rank: jnp.ndarray,
                             origin, cell_size: float, grid_hw,
                             capacity: int, r: int,
                             tile_rows: int) -> jnp.ndarray:
    """`bin_points_planes` with a HOST-precomputed in-cell rank
    (dcf.data.preprocess.fusion_host_arrays; rank == -1 marks points
    invalid for this scale). Cell coords are recomputed elementwise with
    the identical float32 arithmetic (free next to the scatter); the
    rank scans + cumsum-image gathers never run on device."""
    H, W = grid_hw
    P, D = points.shape
    C = capacity
    TH, H_eff, TS, WP, RP = _plane_geometry(H, W, r, tile_rows)
    ix = jnp.floor((points[:, 0] - origin[0]) / cell_size).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - origin[1]) / cell_size).astype(jnp.int32)
    ok = (rank >= 0) & (rank < C)
    return _scatter_planes(points, ok, rank, ix, iy, C, RP, WP, D, P,
                           r, origin, cell_size)


def bin_points_planes_multi(points, ranks, origin, cell_sizes, grids,
                            capacity: int, r: int, tile_rows: int):
    """EVERY fusion scale's plane tables from ONE flat scatter.

    Semantically `[bin_points_planes_ranked(points, ranks[s], ...) for
    s]` (bit-identical, tested), but all scales' updates land in one
    unique-indices scatter over one concatenated flat buffer: XLA's
    scatter cost tracks the update count plus a per-op serialization
    overhead, and the packed z|gidx word (scale-invariant) is computed
    once instead of per scale. With _D == 2 this is 2*S*P updates for
    the whole fusion pipeline where round 3 spent 5P per scale in four
    separate ops.

    Args:
      points: [P, 4] payload rows (x, y, z, gidx), host-sorted order.
      ranks: [S, P] int32 per-scale in-cell ranks (-1 == invalid),
        from dcf.data.preprocess.fusion_host_arrays.
      cell_sizes: S per-scale cell sizes (metres).
      grids: S per-scale (H, W) pairs.

    Returns:
      list of S [_D, capacity, RP_s, WP_s] float32 plane arrays.
    """
    P, D = points.shape
    assert D == 4, D
    assert P <= 0xFFFE, P                # gidx + 1 must fit 16 bits
    C = capacity
    S = len(grids)
    assert ranks.shape[0] == S, (ranks.shape, S)
    shapes, sizes = [], []
    for (H, W) in grids:
        _, _, _, WP, RP = _plane_geometry(H, W, r, tile_rows)
        shapes.append((RP, WP))
        sizes.append(_D * C * RP * WP)
    offs = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offs[-1])

    pzg = _pack_zg(points[:, 2],
                   points[:, 3].astype(jnp.int32) + 1)          # shared
    iota = jnp.arange(P, dtype=jnp.int32)
    idx_parts, val_parts = [], []
    for s, ((H, W), cell) in enumerate(zip(grids, cell_sizes)):
        RP, WP = shapes[s]
        plane = C * RP * WP
        rank = ranks[s]
        ix = jnp.floor((points[:, 0] - origin[0]) / cell).astype(jnp.int32)
        iy = jnp.floor((points[:, 1] - origin[1]) / cell).astype(jnp.int32)
        ok = (rank >= 0) & (rank < C)
        ccx = origin[0] + (ix.astype(jnp.float32) + 0.5) * cell
        ccy = origin[1] + (iy.astype(jnp.float32) + 0.5) * cell
        pxy = _pack_xy(points[:, 0] - ccx, points[:, 1] - ccy)
        spatial = int(offs[s]) + (rank * RP + ix + r) * WP + (iy + r)
        # dropped updates get distinct indices past the buffer end so
        # unique_indices holds (mode="drop" discards them)
        drop = total + (2 * s) * P + iota
        idx_parts.append(jnp.where(ok, spatial, drop))
        idx_parts.append(jnp.where(ok, spatial + plane, drop + P))
        val_parts.append(pxy)
        val_parts.append(pzg)
    idx = jnp.concatenate(idx_parts)                     # [_D * S * P]
    vals = jnp.concatenate(val_parts)
    flat = jnp.zeros((total,), jnp.float32)
    flat = flat.at[idx].set(vals, mode="drop", unique_indices=True)
    return [flat[int(offs[s]):int(offs[s + 1])]
            .reshape(_D, C, shapes[s][0], shapes[s][1])
            for s in range(S)]


def _pack_payload(spoints, ix, iy, origin, cell_size):
    """[P, 4] raw payload -> the two packed plane words (_D layout note).

    The cell-center subtraction uses the twin's exact f32 formula so the
    kernel's center + offset reconstruction is bit-identical."""
    ccx = origin[0] + (ix.astype(jnp.float32) + 0.5) * cell_size
    ccy = origin[1] + (iy.astype(jnp.float32) + 0.5) * cell_size
    pxy = _pack_xy(spoints[:, 0] - ccx, spoints[:, 1] - ccy)    # [P]
    pzg = _pack_zg(spoints[:, 2],
                   spoints[:, 3].astype(jnp.int32) + 1)         # [P]
    return pxy, pzg


def _scatter_planes(spoints, ok, rank, ix, iy, C, RP, WP, D, P, r,
                    origin, cell_size):
    """One flat unique-indices scatter of all payload fields into the
    kernel's [_D, C, RP, WP] plane layout; plane 0 packs the bf16
    cell-center offsets (dx | dy), plane 1 packs (bf16 z | gidx + 1)
    with 0 marking empty slots -- see the _D layout note -- so the
    whole 4-field payload + validity costs _D*P == 2P updates instead
    of 5P."""
    assert D == 4, D                     # payload rows: x, y, z, gidx
    assert P <= 0xFFFE, P                # gidx + 1 must fit 16 bits
    # spatial offset of the point's cell inside one [RP, WP] plane
    spatial = (rank * RP + ix + r) * WP + (iy + r)              # [P]
    plane = C * RP * WP
    iota = jnp.arange(P, dtype=jnp.int32)
    base = jnp.where(ok, spatial, _D * plane + iota)            # drop slot
    pxy, pzg = _pack_payload(spoints, ix, iy, origin, cell_size)
    vals = jnp.concatenate([pxy, pzg])                          # [_D * P]
    idx = (base[None, :]
           + plane * jnp.arange(_D, dtype=jnp.int32)[:, None]
           ).reshape(-1)                                        # [_D * P]
    flat = jnp.zeros((_D * plane,), jnp.float32)
    flat = flat.at[idx].set(vals.astype(jnp.float32), mode="drop",
                            unique_indices=True)
    return flat.reshape(_D, C, RP, WP)


def _coarse_rank_presorted(points, mask, origin, cell_size, grid_hw,
                           rho: int, sort_valid=None):
    """Rank-within-coarse-cell for fine-cell-grouped points, sort-free.

    Args:
      points: [P, D], fine-grid row-major sorted (sort_points_for_fusion).
      mask: [P] validity (this scale's image-visibility mask).
      cell_size: THIS scale's cell size; the fine cell is cell_size/rho.
      grid_hw: this scale's (H, W); the fine grid is (H*rho, W*rho).
      sort_valid: [P] bool, True where the SORT considered the point
        in-grid (those points are cell-contiguous). Points invalid at
        sort time sit at the array tail regardless of their coords; if
        spatially in-grid (e.g. zero-padding rows at the grid origin)
        they would form ghost runs of real cells there, so they must be
        grouped under the sentinel instead.

    Returns (ix, iy, rank, inb): coarse cell coords, rank of each valid
    point among its coarse cell's valid points in arrival order
    (== the stable-argsort path's rank), and the validity.
    """
    H, W = grid_hw
    Hf, Wf = H * rho, W * rho
    cf = cell_size / rho
    fx = jnp.floor((points[:, 0] - origin[0]) / cf).astype(jnp.int32)
    fy = jnp.floor((points[:, 1] - origin[1]) / cf).astype(jnp.int32)
    spatial = (fx >= 0) & (fx < Hf) & (fy >= 0) & (fy < Wf)
    if sort_valid is not None:
        spatial = spatial & sort_valid
    inb = mask & spatial
    ix = fx // rho
    iy = fy // rho

    # rank within own fine cell (valid-only, segmented scan over the
    # arrival grouping -- same scheme as the presorted fine path)
    fgroup = jnp.where(spatial, fx * Wf + fy, Hf * Wf)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), fgroup[1:] != fgroup[:-1]])
    valid32 = inb.astype(jnp.int32)

    def seg_op(a, b):
        return (a[0] | b[0], jnp.where(b[0], b[1], a[1] + b[1]))

    _, incl = jax.lax.associative_scan(seg_op, (start, valid32))
    rank_fine = incl - valid32

    # per-fine-cell valid counts: `incl` at each run's last element is
    # the run's total; one unique-indices scatter builds the raster
    is_end = jnp.concatenate([start[1:], jnp.ones((1,), bool)])
    okc = is_end & (fgroup < Hf * Wf)
    tgt = jnp.where(okc, fgroup, Hf * Wf)
    cnt = (jnp.zeros((Hf * Wf,), jnp.int32)
           .at[tgt].set(incl, mode="drop", unique_indices=True)
           .reshape(Hf, Wf))

    # S[fx, fy] = inclusive cumsum of counts along fine cols
    S = jnp.cumsum(cnt, axis=1)                                # [Hf, Wf]
    # per-(fine row, coarse col) block sums, then their inclusive
    # cumsum down fine rows (within the whole column -- block-start
    # subtraction happens at gather time)
    ends = S[:, rho - 1::rho]                                  # [Hf, W]
    blk = ends - jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))       # [Hf, W]
    W1 = jnp.cumsum(blk, axis=0)                               # [Hf, W]

    def img_at(img, i, j):
        """img[i, j] with out-of-range rows/cols reading as 0."""
        ok = (i >= 0) & (j >= 0)
        flat = img.reshape(-1)
        idx = jnp.clip(i, 0, img.shape[0] - 1) * img.shape[1] \
            + jnp.clip(j, 0, img.shape[1] - 1)
        return jnp.where(ok, flat[idx], 0)

    # earlier fine ROWS of my coarse cell: sum over fx' in [ix*rho, fx)
    a = img_at(W1, fx - 1, iy) - img_at(W1, ix * rho - 1, iy)
    # earlier fine cells in MY fine row's block: fy' in [iy*rho, fy)
    b = img_at(S, fx, fy - 1) - img_at(S, fx, iy * rho - 1)
    # a/b garbage out-of-grid; masked by inb in the caller's `ok`
    rank = rank_fine + a + b
    return ix, iy, rank, inb


def build_planes(bins: DenseBins, r: int, tile_rows: int,
                 origin, cell_size: float,
                 num_points: int | None = None) -> jnp.ndarray:
    """[B, H, W, C, 4] bins -> [B, _D, C, RP, WP] field planes (plane 0
    packs the bf16 cell-center offsets (dx | dy), plane 1 packs
    (bf16 z | (gidx + 1) * valid) with 0 marking empty slots -- see the
    _D layout note), zero-padded r rows/cols top/left, aligned slack
    elsewhere.

    num_points, when the caller knows it, bounds the gidx payload: the
    pack keeps only the low 16 bits, so gidx + 1 must fit (mirrors the
    P <= 0xFFFE assert in _scatter_planes; without it >65534-point bins
    would alias z1 rows silently)."""
    B, H, W, C, D = bins.data.shape
    assert D == 4, D
    if num_points is not None:
        assert num_points <= 0xFFFE, num_points  # gidx + 1 must fit 16 bits
    TH, H_eff, TS, WP, RP = _plane_geometry(H, W, r, tile_rows)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ccx = (origin[0] + (rows.astype(jnp.float32) + 0.5)
           * cell_size)[..., None]                            # [H, W, 1]
    ccy = (origin[1] + (cols.astype(jnp.float32) + 0.5)
           * cell_size)[..., None]
    pxy = _pack_xy(bins.data[..., 0].astype(jnp.float32) - ccx,
                   bins.data[..., 1].astype(jnp.float32) - ccy)
    pxy = jnp.where(bins.valid, pxy, 0.0)
    gp1 = ((bins.data[..., 3].astype(jnp.int32) + 1)
           * bins.valid.astype(jnp.int32))                    # [B, H, W, C]
    packed = _pack_zg(bins.data[..., 2].astype(jnp.float32), gp1)
    # empty slots must be all-zero words (validity == low 16 bits)
    packed = jnp.where(bins.valid, packed, 0.0)
    data = jnp.stack([pxy, packed], axis=-1)
    planes = jnp.transpose(data, (0, 4, 3, 1, 2))
    return jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (r, RP - H - r),
                            (r, WP - W - r)))


def slab_starts(fine_row: jnp.ndarray, num_slabs: int, tile_rows: int,
                r: int, row_ratio: int, capz: int, p_pad: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Aligned z1-slab start offsets per row-slab, plus overflow counts.

    Args:
      fine_row: [P] fine-grid row of each *sorted* point (out-of-grid /
        invalid points carry a large sentinel so they sort last).
      row_ratio: scale rows -> fine rows multiplier (scale_stride / fine).
      capz: slab capacity (rows of the z1 table DMA'd per program).

    Returns:
      starts: [num_slabs] int32, multiples of 128, clamped to
        [0, p_pad - capz].
      overflow: [num_slabs] int32 -- points of the slab's row range that
        fall outside its capz window (dropped pairs if ever selected);
        0 everywhere on KITTI-scale data with the default caps.
    """
    slabs = jnp.arange(num_slabs, dtype=jnp.int32)
    lo = (slabs * tile_rows - r) * row_ratio                     # [NS]
    hi = (slabs * tile_rows + tile_rows + r) * row_ratio
    below_lo = jnp.sum(fine_row[None, :] < lo[:, None], axis=1)
    below_hi = jnp.sum(fine_row[None, :] < hi[:, None], axis=1)
    starts = jnp.clip((below_lo // 128) * 128, 0,
                      max(p_pad - capz, 0)).astype(jnp.int32)
    overflow = jnp.maximum(below_hi - (starts + capz), 0)
    return starts, overflow


def fine_row_cum(fine_row: jnp.ndarray, Hf: int) -> jnp.ndarray:
    """Cumulative histogram of the (sorted) fine rows: cum[x] == #points
    with fine_row < x, for x in [0, Hf].

    This is the only O(P) work in `fusion_windows`, and it is
    scale-INVARIANT (scales differ only in where they read the cumsum),
    so the detector computes it once and shares it across every fusion
    scale -- or ships it precomputed from the host
    (dcf.data.preprocess.fusion_host_arrays' "fusion_row_cum")."""
    hist = jnp.zeros((Hf,), jnp.int32).at[fine_row].add(
        1, mode="drop", indices_are_sorted=True)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)])


def fusion_windows(fine_row: jnp.ndarray | None, num_slabs: int,
                   tile_rows: int,
                   r: int, row_ratio: int, capz: int, capr: int,
                   p_pad: int, cum: jnp.ndarray | None = None
                   ) -> Tuple[jnp.ndarray, jnp.ndarray,
                              jnp.ndarray]:
    """Slab starts + per-ROW z1 window offsets, via one cumulative
    histogram of the sorted fine rows (O(P), no [rows, P] compare).

    A BEV row at this scale only ever selects neighbors from fine rows
    [(row - r) * ratio, (row + 1 + r) * ratio) -- a (1 + 2r) / (TH + 2r)
    fraction of its slab's point range -- so the kernel's one-hot
    selection matmuls can run `capr` wide instead of `capz` wide. The
    row window is the binding cap: a pair is admitted iff its point
    falls inside [start + roff, start + roff + capr), so `overflow`
    (points of the row's geometric range past the window end; the
    rounded-down start can never cut the front) fully accounts for
    dropped pairs.

    Returns:
      starts: [num_slabs] int32 slab DMA offsets (== `slab_starts`).
      roffs: [num_slabs * tile_rows] int32 per-row window offsets
        RELATIVE to the row's slab start, multiples of 128, clipped to
        [0, capz - capr] (the window always lies inside the slab).
      overflow: [num_slabs * tile_rows] int32 dropped-pair counts.

    `cum`, when given, is a precomputed `fine_row_cum` (possibly longer
    than this scale's Hf + 1 -- valid because real fine rows are always
    < every scale's Hf, so the tail is flat) and fine_row may be None.
    """
    H_eff = num_slabs * tile_rows
    Hf = H_eff * row_ratio
    if cum is None:
        # fine_row is sorted (points are fine-cell row-major sorted;
        # the invalid sentinel lands past Hf and drops from the
        # histogram), so #points with fine_row < x == cum[x]
        cum = fine_row_cum(fine_row, Hf)

    def below(x):
        return cum[jnp.clip(x, 0, Hf)]

    slabs = jnp.arange(num_slabs, dtype=jnp.int32)
    starts = jnp.clip(
        (below((slabs * tile_rows - r) * row_ratio) // 128) * 128,
        0, max(p_pad - capz, 0)).astype(jnp.int32)

    rows = jnp.arange(H_eff, dtype=jnp.int32)
    start_of_row = starts[rows // tile_rows]
    r_lo = below((rows - r) * row_ratio)
    r_hi = below((rows + 1 + r) * row_ratio)
    roffs = jnp.clip(((r_lo - start_of_row) // 128) * 128,
                     0, max(capz - capr, 0)).astype(jnp.int32)
    overflow = jnp.maximum(r_hi - (start_of_row + roffs + capr), 0)
    return starts, roffs, overflow


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _valid16(w):
    """Packed-plane validity: low 16 bits (gidx + 1) nonzero."""
    return (pltpu.bitcast(w, jnp.uint32) & 0xFFFF) > 0


# in-cascade payload fields carried per selected neighbor: the pixel-
# relative offsets (ddx, ddy) -- already reconstructed from the packed
# plane, they ARE the geo-MLP's first two inputs -- plus the packed
# (bf16 z | gidx + 1) word
_F = 3


def _unpack_candidate(sxy, szg, cx, cy, ccx, ccy):
    """Packed candidate planes (rolled, [TH, WP]) -> (validity,
    pixel-relative ddx/ddy, the zg word).

    Reconstruction is exact-parity-critical: absolute position ==
    cell_center + bf16 offset with the twin's f32 formula (cell centers
    ccx/ccy are precomputed per roll shift), then ddx = pos - cx exactly
    as knn_select_dense computes it."""
    v = _valid16(szg)
    bits = pltpu.bitcast(sxy, jnp.uint32)
    dxq = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000), jnp.float32)
    dyq = pltpu.bitcast(bits << 16, jnp.float32)
    ddx = (ccx + dxq) - cx
    ddy = (ccy + dyq) - cy
    return v, ddx, ddy


def _shift_centers(cx, cy, TH, r, win, origin, cell_size, ti):
    """Per-roll-shift candidate cell centers: ccx[di], ccy[dj], each
    [TH, WP] f32 built with the twin's exact center formula (the
    candidate at shift (di, dj) of pixel (i, j) sits in grid cell
    (i + di - r, j + dj - r))."""
    WP = cx.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (TH, WP), 0) + ti * TH
    cols = jax.lax.broadcasted_iota(jnp.int32, (TH, WP), 1)
    ccx = [origin[0] + ((rows + (di - r)).astype(jnp.float32) + 0.5)
           * cell_size for di in range(win)]
    ccy = [origin[1] + ((cols + (dj - r)).astype(jnp.float32) + 0.5)
           * cell_size for dj in range(win)]
    return ccx, ccy


def _cascade_onepass(scr, cx, cy, ccx, ccy, *, TH, C, K, r):
    """Classic streaming KNN insertion cascade (knn_kernel.py scheme):
    every candidate runs the full K-deep compare/swap chain over all
    _F payload fields. 2K + K*_F (TH, WP) arrays stay live across the
    whole candidate loop. Validity comes from the zg plane's packed low
    16 bits (gidx + 1 > 0 -- the packed layout, see the _D note)."""
    WP = cx.shape[1]
    top_d = [jnp.full((TH, WP), _BIG, jnp.float32) for _ in range(K)]
    top_p = [[jnp.zeros((TH, WP), jnp.float32) for _ in range(_F)]
             for _ in range(K)]
    win = 2 * r + 1
    for c in range(C):
        fxy, fzg = scr[0, c], scr[1, c]
        for di in range(win):
            for dj in range(win):
                sxy = _roll2(fxy, di, dj)[:TH, :]
                szg = _roll2(fzg, di, dj)[:TH, :]
                v, ddx, ddy = _unpack_candidate(sxy, szg, cx, cy,
                                                ccx[di], ccy[dj])
                d = jnp.where(v, ddx * ddx + ddy * ddy, jnp.float32(_BIG))
                p = [ddx, ddy, szg]
                for k in range(K):
                    closer = d < top_d[k]
                    new_d = jnp.minimum(d, top_d[k])
                    d = jnp.maximum(d, top_d[k])
                    top_d[k] = new_d
                    for f in range(_F):
                        new_f = jnp.where(closer, p[f], top_p[k][f])
                        p[f] = jnp.where(closer, top_p[k][f], p[f])
                        top_p[k][f] = new_f
    return top_d, top_p


def _cascade_twopass(scr, cx, cy, ccx, ccy, *, TH, C, K, r, SG):
    """Two-pass KNN selection with bounded live state (register-pressure
    variant of `_cascade_onepass`; selects the IDENTICAL point set).

    The one-pass cascade keeps 2K + K*_D ~ 20+ (TH, WP) f32 arrays live
    per candidate step -- past the VPU register file, so Mosaic spills
    the swap chains to VMEM on every candidate. Here:

      pass 1: distance-only cascade augmented with the arrival index --
        K (d, i) pairs live (strict-< insertion == stable K-smallest by
        the lexicographic key (d, arrival)). Only the boundary key
        (kd, ki) = slot K-1 survives.
      pass 2: re-enumerate candidates in the same order; a candidate is
        selected iff its key <= (kd, ki) (and d < _BIG: with fewer than
        K valid candidates the boundary is the untouched sentinel and
        the tie rule would otherwise admit arbitrary invalid pairs).
        Exactly min(K, #valid) candidates pass, so a running count
        assigns each selected candidate a distinct slot; `SG` slots are
        materialized per sweep (live state: SG payload columns + the
        boundary + the count).

    Slots come out in candidate order, not distance order -- the
    consumers (masked K-sum forward, per-slot backward) are
    slot-permutation-invariant, so outputs match `_cascade_onepass`
    bit-for-bit wherever candidate distances are tie-free (ties at the
    K boundary select the same SET by stability; within-set slot
    assignment differs, which the K-sum erases).
    """
    WP = cx.shape[1]
    win = 2 * r + 1
    # pass 1: boundary key
    top_d = [jnp.full((TH, WP), _BIG, jnp.float32) for _ in range(K)]
    top_i = [jnp.full((TH, WP), jnp.float32(1 << 30), jnp.float32)
             for _ in range(K)]
    idx = 0
    for c in range(C):
        fxy, fzg = scr[0, c], scr[1, c]
        for di in range(win):
            for dj in range(win):
                sxy = _roll2(fxy, di, dj)[:TH, :]
                szg = _roll2(fzg, di, dj)[:TH, :]
                v, ddx, ddy = _unpack_candidate(sxy, szg, cx, cy,
                                                ccx[di], ccy[dj])
                d = jnp.where(v, ddx * ddx + ddy * ddy, jnp.float32(_BIG))
                i = jnp.full((TH, WP), jnp.float32(idx))
                for k in range(K):
                    closer = d < top_d[k]
                    new_d = jnp.minimum(d, top_d[k])
                    d = jnp.maximum(d, top_d[k])
                    new_i = jnp.where(closer, i, top_i[k])
                    i = jnp.where(closer, top_i[k], i)
                    top_d[k] = new_d
                    top_i[k] = new_i
                idx += 1
    kd = top_d[K - 1]
    ki = top_i[K - 1]

    # pass 2: slot placement, SG slots per sweep
    out_d = [None] * K
    out_p = [[None] * _F for _ in range(K)]
    for k0 in range(0, K, SG):
        ks = range(k0, min(k0 + SG, K))
        sd = {k: jnp.full((TH, WP), _BIG, jnp.float32) for k in ks}
        sp = {k: [jnp.zeros((TH, WP), jnp.float32) for _ in range(_F)]
              for k in ks}
        cnt = jnp.zeros((TH, WP), jnp.float32)
        idx = 0
        for c in range(C):
            fxy, fzg = scr[0, c], scr[1, c]
            for di in range(win):
                for dj in range(win):
                    sxy = _roll2(fxy, di, dj)[:TH, :]
                    szg = _roll2(fzg, di, dj)[:TH, :]
                    v, ddx, ddy = _unpack_candidate(sxy, szg, cx, cy,
                                                    ccx[di], ccy[dj])
                    d = jnp.where(v, ddx * ddx + ddy * ddy,
                                  jnp.float32(_BIG))
                    sh = [ddx, ddy, szg]
                    accept = (d < kd) | ((d == kd)
                                         & (ki >= jnp.float32(idx))
                                         & (d < _BIG))
                    for k in ks:
                        take = accept & (cnt == jnp.float32(k))
                        sd[k] = jnp.where(take, d, sd[k])
                        for f in range(_F):
                            sp[k][f] = jnp.where(take, sh[f], sp[k][f])
                    cnt = cnt + accept.astype(jnp.float32)
                    idx += 1
        for k in ks:
            out_d[k] = sd[k]
            out_p[k] = sp[k]
    return out_d, out_p


def _fwd_kernel(starts_ref, rstarts_ref, planes_hbm, z1t_hbm, wsmall_ref,
                out_ref, scr, z1scr, sem_p, sem_z, *,
                TH, TS, W, WP, C, K, r, HID, CAPZ, CAPR, origin, cell_size,
                STASH=False, CASCADE="onepass", SG=2):
    # wsmall packs the small params lane-padded (tiny-minor-dim blocks
    # crash the Mosaic compiler): cols 0:4 = wgt [hid, 4], col 4 = bg
    b = pl.program_id(0)
    ti = pl.program_id(1)
    start = starts_ref[b, ti]
    start = pl.multiple_of(start, 128)

    cp = pltpu.make_async_copy(
        planes_hbm.at[b, :, :, pl.ds(ti * TH, TS), :], scr, sem_p)
    cz = pltpu.make_async_copy(
        z1t_hbm.at[b, :, pl.ds(start, CAPZ)], z1scr, sem_z)
    cp.start()
    cz.start()
    cp.wait()
    cz.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TH, WP), 0) + ti * TH
    cols = jax.lax.broadcasted_iota(jnp.int32, (TH, WP), 1)
    cx = origin[0] + (rows.astype(jnp.float32) + 0.5) * cell_size
    cy = origin[1] + (cols.astype(jnp.float32) + 0.5) * cell_size
    ccx, ccy = _shift_centers(cx, cy, TH, r, 2 * r + 1, origin,
                              cell_size, ti)

    if CASCADE == "twopass":
        top_d, top_p = _cascade_twopass(scr, cx, cy, ccx, ccy, TH=TH,
                                        C=C, K=K, r=r, SG=SG)
    else:
        top_d, top_p = _cascade_onepass(scr, cx, cy, ccx, ccy, TH=TH,
                                        C=C, K=K, r=r)

    # fused per-row MLP: one-hot select z1 (MXU) + geometric projection.
    # The cascade's payload already carries the pixel-relative offsets
    # (ddx, ddy) -- the geo MLP's first two inputs -- so no center
    # subtraction happens here.
    iota_cr = jax.lax.broadcasted_iota(jnp.int32, (CAPR, W), 0)
    for rr in range(TH):
        acc = jnp.zeros((HID, W), jnp.float32)
        cnt = jnp.zeros((1, W), jnp.float32)
        # per-ROW z1 window: this row's neighbors live in a capr-point
        # range of the slab (fusion_windows), so the one-hot select runs
        # CAPR wide instead of CAPZ wide (~(TH+2r)/(1+2r) x fewer MXU
        # flops on the kernel's dominant matmul)
        roff = rstarts_ref[b, ti * TH + rr]
        roff = pl.multiple_of(roff, 128)
        slab_r = z1scr[:, pl.ds(roff, CAPR)]                  # [HID, CAPR]
        # the packed plane's low 16 bits carry gidx + 1 (0 == empty);
        # absorb the +1 into the window base
        rbase = start + roff + 1
        for k in range(K):
            d_r = top_d[k][rr:rr + 1, :W]
            pairok = d_r < _BIG
            bits = pltpu.bitcast(top_p[k][2][rr:rr + 1, :W], jnp.uint32)
            lidx = (bits & 0xFFFF).astype(jnp.int32) - rbase
            pz = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000),
                               jnp.float32)                   # bf16 z
            ok = pairok & (lidx >= 0) & (lidx < CAPR)
            key = jnp.where(ok, lidx, -1)
            oh = (iota_cr == key).astype(jnp.bfloat16)        # [CAPR, W]
            z1sel = jax.lax.dot_general(
                slab_r, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [HID, W]
            geo = (top_p[k][0][rr:rr + 1, :W],
                   top_p[k][1][rr:rr + 1, :W],
                   pz,
                   jnp.sqrt(jnp.minimum(d_r, 1e6)))
            # geometric projection on the VPU: 4 broadcast FMAs beat a
            # contraction-dim-4 MXU matmul
            g1 = wsmall_ref[:, 4:5]                           # bias
            for f in range(4):
                g1 = g1 + wsmall_ref[:, f:f + 1] * geo[f]     # [HID, W]
            okf = ok.astype(jnp.float32)
            acc = acc + jnp.maximum(z1sel + g1, 0.0) * okf
            cnt = cnt + okf
        out_ref[0, :HID, rr, :] = acc
        out_ref[0, HID:HID + 1, rr, :] = cnt
        if STASH:
            # stash the cascade's selections for the backward (training
            # path): per k, (ddx, ddy, packed(z | gidx + 1), d2) as 4
            # extra channels (ddx/ddy pixel-relative, i.e. the geo MLP
            # inputs directly). The backward then skips the planes DMA
            # and the whole KNN cascade recompute.
            for k in range(K):
                base = HID + 1 + 4 * k
                out_ref[0, base + 0:base + 1, rr, :] = \
                    top_p[k][0][rr:rr + 1, :W]
                out_ref[0, base + 1:base + 2, rr, :] = \
                    top_p[k][1][rr:rr + 1, :W]
                out_ref[0, base + 2:base + 3, rr, :] = \
                    top_p[k][2][rr:rr + 1, :W]
                out_ref[0, base + 3:base + 4, rr, :] = \
                    top_d[k][rr:rr + 1, :W]


# --------------------------------------------------------------------------
# backward kernel: read the forward's stashed (point, distance)
# selections, rebuild pre-activations, then MXU segment-sums
# (transposed one-hot matmuls) for d_z1 / d_wg / d_bg
# --------------------------------------------------------------------------

def _bwd_kernel(starts_ref, rstarts_ref, z1t_hbm, wsmall_ref, dacc_ref,
                stash_ref, dz1_ref, dsmall_ref, z1scr, sem_z, *,
                TH, W, K, HID, CAPZ, CAPR, origin, cell_size):
    # grid (B, NS). Each program reads the forward's stashed
    # per-(pixel, k) selections (no planes DMA, no cascade recompute).
    # The transposed one-hot segment-sum for d_z1 runs CAPR wide per row
    # (the row's window fully contains its selected pairs, so the rows
    # PARTITION the pairs) and accumulates into the slab-sized output
    # block in place at the row's window offset -- the MXU work matches
    # the forward's, (TH+2r)/(1+2r) x less than slab-wide matmuls.
    b = pl.program_id(0)
    ti = pl.program_id(1)
    start = starts_ref[b, ti]
    start = pl.multiple_of(start, 128)

    cz = pltpu.make_async_copy(
        z1t_hbm.at[b, :, pl.ds(start, CAPZ)], z1scr, sem_z)
    cz.start()
    cz.wait()

    dz1_ref[0, 0] = jnp.zeros((HID, CAPZ), jnp.float32)
    iota_cr = jax.lax.broadcasted_iota(jnp.int32, (CAPR, W), 0)
    dsm = [jnp.zeros((HID, 1), jnp.float32) for _ in range(5)]
    for rr in range(TH):
        da = dacc_ref[0, :, rr, :]                            # [HID, W]
        roff = rstarts_ref[b, ti * TH + rr]
        roff = pl.multiple_of(roff, 128)
        slab_r = z1scr[:, pl.ds(roff, CAPR)]                  # [HID, CAPR]
        # the stash's packed channel carries (bf16 z | gidx + 1);
        # absorb the +1 into the window base
        rbase = start + roff + 1
        drow = jnp.zeros((HID, CAPR), jnp.float32)
        for k in range(K):
            base = 4 * k
            px = stash_ref[0, base + 0, rr:rr + 1, :]         # [1, W]
            py = stash_ref[0, base + 1, rr:rr + 1, :]
            bits = pltpu.bitcast(stash_ref[0, base + 2, rr:rr + 1, :],
                                 jnp.uint32)
            d_r = stash_ref[0, base + 3, rr:rr + 1, :]
            pz = pltpu.bitcast(bits & jnp.uint32(0xFFFF0000),
                               jnp.float32)                   # bf16 z
            pairok = d_r < _BIG
            lidx = (bits & 0xFFFF).astype(jnp.int32) - rbase
            ok = pairok & (lidx >= 0) & (lidx < CAPR)
            key = jnp.where(ok, lidx, -1)
            oh = (iota_cr == key).astype(jnp.bfloat16)        # [CAPR, W]
            z1sel = jax.lax.dot_general(
                slab_r, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)           # [HID, W]
            geo = (px, py, pz,
                   jnp.sqrt(jnp.minimum(d_r, 1e6)))
            g1 = wsmall_ref[:, 4:5]
            for f in range(4):
                g1 = g1 + wsmall_ref[:, f:f + 1] * geo[f]
            pre = z1sel + g1
            live = (pre > 0.0).astype(jnp.float32) * ok.astype(jnp.float32)
            dpre = da * live                                  # [HID, W]
            # d_z1 segment-sum on the MXU: contract the pixel axis of
            # both operands -- d_z1[h, c] = sum_pix dpre * oh
            drow = drow + jax.lax.dot_general(
                dpre.astype(jnp.bfloat16), oh,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [HID, CAPR]
            for f in range(4):
                dsm[f] = dsm[f] + jnp.sum(dpre * geo[f], axis=1,
                                          keepdims=True)
            dsm[4] = dsm[4] + jnp.sum(dpre, axis=1, keepdims=True)
        cur = dz1_ref[0, 0, :, pl.ds(roff, CAPR)]
        dz1_ref[0, 0, :, pl.ds(roff, CAPR)] = cur + drow
    for f in range(5):
        dsmall_ref[0, 0, :, f:f + 1] = dsm[f]


# --------------------------------------------------------------------------
# host-side wrappers + custom VJP
# --------------------------------------------------------------------------

def _sizes(planes, z1t, tile_rows, r, H, W):
    B = planes.shape[0]
    C = planes.shape[2]
    HID = z1t.shape[1]                 # z1t is feature-major [B, hid, P_pad]
    TH, H_eff, TS, WP, RP = _plane_geometry(H, W, r, tile_rows)
    NS = H_eff // TH
    return B, C, HID, TH, H_eff, TS, WP, NS


def _pack_small(wgt, bg):
    """[hid, 4] + [hid, 1] -> one lane-padded [hid, 128] VMEM input."""
    hid = wgt.shape[0]
    return jnp.concatenate(
        [wgt.astype(jnp.float32), bg.astype(jnp.float32),
         jnp.zeros((hid, 123), jnp.float32)], axis=1)


def _fwd_impl(planes, z1t, starts, rstarts, wgt, bg, origin, cell_size, k,
              radius_cells, tile_rows, capz, capr, H, W, interpret,
              stash=False, cascade="onepass", slot_group=2):
    """stash=True (training path) widens the output by 4*K channels
    carrying each pixel's selected (px, py, packed(z | gidx + 1), d2)
    per neighbor,
    and returns the FULL H_eff rows -- the backward consumes them in
    place of re-running the KNN cascade."""
    B, C, HID, TH, H_eff, TS, WP, NS = _sizes(planes, z1t, tile_rows,
                                              radius_cells, H, W)
    OC = HID + 1 + (4 * k if stash else 0)
    kernel = functools.partial(
        _fwd_kernel, TH=TH, TS=TS, W=W, WP=WP, C=C, K=k, r=radius_cells,
        HID=HID, CAPZ=capz, CAPR=capr, origin=origin, cell_size=cell_size,
        STASH=stash, CASCADE=cascade, SG=slot_group)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, OC, TH, W),
                               lambda b, i, *_: (b, 0, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((_D, C, TS, WP), jnp.float32),
            pltpu.VMEM((HID, capz), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OC, H_eff, W), jnp.float32),
        interpret=interpret,
    )(starts, rstarts, planes, z1t, _pack_small(wgt, bg))
    if stash:
        return out                     # caller splits value / stash
    return out[:, :, :H]


def _bwd_impl(stash, z1t, starts, rstarts, wgt, bg, dacc, origin,
              cell_size, k, radius_cells, tile_rows, capz, capr, H, W,
              interpret):
    """stash: [B, 4*k, H_eff, W] forward-stashed selections."""
    B = z1t.shape[0]
    HID = z1t.shape[1]
    TH, H_eff, TS, WP, RP = _plane_geometry(H, W, radius_cells, tile_rows)
    NS = H_eff // TH
    dacc = jnp.pad(dacc, ((0, 0), (0, 0), (0, H_eff - H), (0, 0)))
    kernel = functools.partial(
        _bwd_kernel, TH=TH, W=W, K=k, HID=HID, CAPZ=capz, CAPR=capr,
        origin=origin, cell_size=cell_size)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, NS),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HID, TH, W), lambda b, i, *_: (b, 0, i, 0)),
            pl.BlockSpec((1, 4 * k, TH, W),
                         lambda b, i, *_: (b, 0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, HID, capz),
                         lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, HID, 128),
                         lambda b, i, *_: (b, i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((HID, capz), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )
    dz1_slabs, dsmall = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, NS, HID, capz), jnp.float32),
            jax.ShapeDtypeStruct((B, NS, HID, 128), jnp.float32),
        ],
        interpret=interpret,
    )(starts, rstarts, z1t, _pack_small(wgt, bg), dacc, stash)

    # combine per-slab ranges (they overlap only in halo rows) into the
    # full [B, HID, P_pad] cotangent with NS unrolled slice-adds
    P_pad = z1t.shape[2]
    dz1t = jnp.zeros((B, HID, P_pad), jnp.float32)

    def add_slab(dz1t_b, slabs_b, starts_b):
        for ti in range(slabs_b.shape[0]):
            cur = jax.lax.dynamic_slice(
                dz1t_b, (0, starts_b[ti]), (HID, capz))
            dz1t_b = jax.lax.dynamic_update_slice(
                dz1t_b, cur + slabs_b[ti], (0, starts_b[ti]))
        return dz1t_b

    dz1t = jax.vmap(add_slab)(dz1t, dz1_slabs, starts)
    # the rows partition the pairs, so dsm sums across slabs
    small = jnp.sum(dsmall, axis=(0, 1))                      # [HID, 128]
    return dz1t.astype(z1t.dtype), small[:, 0:4], small[:, 4:5]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11,
                                                    12, 13, 14, 15, 16, 17,
                                                    18))
def _fused_fusion_p(planes, z1t, starts, rstarts, wgt, bg, origin,
                    cell_size, k, radius_cells, tile_rows, capz, capr,
                    H, W, interpret, plane_capacity, cascade, slot_group):
    return _fwd_impl(planes, z1t, starts, rstarts, wgt, bg, origin,
                     cell_size, k, radius_cells, tile_rows, capz, capr,
                     H, W, interpret, cascade=cascade,
                     slot_group=slot_group)


def _fused_fusion_fwd(planes, z1t, starts, rstarts, wgt, bg, origin,
                      cell_size, k, radius_cells, tile_rows, capz, capr,
                      H, W, interpret, plane_capacity, cascade,
                      slot_group):
    HID = z1t.shape[1]
    full = _fwd_impl(planes, z1t, starts, rstarts, wgt, bg, origin,
                     cell_size, k, radius_cells, tile_rows, capz, capr,
                     H, W, interpret, stash=True, cascade=cascade,
                     slot_group=slot_group)
    out = full[:, :HID + 1, :H]
    stash = full[:, HID + 1:]              # [B, 4k, H_eff, W]
    # planes carry no cotangent (stop_gradient upstream) and are NOT
    # kept as a residual -- that would pin ~30 MB of HBM per scale; the
    # backward rebuilds the zero from static geometry + plane_capacity
    return out, (stash, z1t, starts, rstarts, wgt, bg)


def _fused_fusion_bwd(origin, cell_size, k, radius_cells, tile_rows, capz,
                      capr, H, W, interpret, plane_capacity, cascade,
                      slot_group, res, g):
    stash, z1t, starts, rstarts, wgt, bg = res
    # g: [B, HID+1, H, W]; the count channel's cotangent carries no
    # parameter dependence (count = sum of geometric masks)
    dz1t, dwgt, dbg = _bwd_impl(
        stash, z1t, starts, rstarts, wgt, bg, g[:, :z1t.shape[1]], origin,
        cell_size, k, radius_cells, tile_rows, capz, capr, H, W,
        interpret)
    _, _, _, WP, RP = _plane_geometry(H, W, radius_cells, tile_rows)
    return (jnp.zeros((stash.shape[0], _D, plane_capacity, RP, WP),
                      jnp.float32),
            dz1t,
            np.zeros(starts.shape, jax.dtypes.float0),
            np.zeros(rstarts.shape, jax.dtypes.float0),
            dwgt.astype(wgt.dtype), dbg.astype(bg.dtype))


_fused_fusion_p.defvjp(_fused_fusion_fwd, _fused_fusion_bwd)


def fused_fusion(bins: DenseBins, z1t: jnp.ndarray, starts: jnp.ndarray,
                 wgt: jnp.ndarray, bg: jnp.ndarray,
                 origin: Tuple[float, float], cell_size: float, k: int,
                 radius_cells: int = 1, tile_rows: int = 8,
                 capz: int = 2048, interpret: bool = False,
                 cascade: str = "onepass", slot_group: int = 2,
                 rstarts: jnp.ndarray | None = None,
                 capr: int | None = None) -> jnp.ndarray:
    """Fused per-scale continuous fusion (differentiable).

    Args:
      bins: batched DenseBins [B, H, W, C, 4], payload (x, y, z, gidx)
        where gidx indexes the *sorted* point order of z1t.
      z1t: [B, P_pad, hid] bf16 per-point hidden image features
        (point-major), P_pad a multiple of 128 and >= capz.
      starts: [B, num_slabs] int32 slab offsets (from `fusion_windows`).
      wgt: [hid, 4] float32 geometric projection (transposed kernel).
      bg: [hid, 1] float32 geometric bias.
      rstarts: [B, num_slabs * tile_rows] int32 per-row window offsets
        relative to the slab start (`fusion_windows`); None -> whole
        slab per row (capr == capz).
      capr: per-row one-hot window width; None -> capz.

    Returns:
      [B, H, W, hid + 1] float32: masked sum over K of
      relu(z1[neighbor] + wgt @ geo + bg), last channel = valid-pair count.
    """
    B, H, W, C, D = bins.data.shape
    assert D == 4, f"payload must be (x, y, z, gidx), got D={D}"
    planes = build_planes(bins, radius_cells, tile_rows, origin,
                          cell_size, num_points=z1t.shape[1])
    # convenience wrapper (tests / twin parity): fused_fusion_planes
    # takes the kernel's feature-major layout
    z1t = jnp.transpose(z1t, (0, 2, 1))
    return fused_fusion_planes(planes, z1t, starts, wgt, bg, origin,
                               cell_size, k, H, W,
                               radius_cells=radius_cells,
                               tile_rows=tile_rows, capz=capz,
                               interpret=interpret, cascade=cascade,
                               slot_group=slot_group, rstarts=rstarts,
                               capr=capr)


def fused_fusion_planes(planes: jnp.ndarray, z1t: jnp.ndarray,
                        starts: jnp.ndarray, wgt: jnp.ndarray,
                        bg: jnp.ndarray, origin, cell_size: float, k: int,
                        H: int, W: int, radius_cells: int = 1,
                        tile_rows: int = 8, capz: int = 2048,
                        interpret: bool = False,
                        cascade: str = "onepass", slot_group: int = 2,
                        rstarts: jnp.ndarray | None = None,
                        capr: int | None = None) -> jnp.ndarray:
    """`fused_fusion` on pre-built [B, D, C, RP, WP] planes (see
    `bin_points_planes` -- skips the bins transpose on the hot path).

    z1t here is FEATURE-major [B, hid, P_pad] -- the kernel's internal
    layout (dynamic slab/window slices must run along the 128-aligned
    point/lane axis; Mosaic rejects dynamic slices of the 64-wide hid
    dim). Callers transpose at the sampling boundary, where XLA fuses
    it with the pad / cast instead of materializing an extra HBM
    relayout per call (and its mirror in the backward)."""
    planes = jax.lax.stop_gradient(planes)
    _, H_eff, _, _, _ = _plane_geometry(H, W, radius_cells, tile_rows)
    if rstarts is None or capr is None:
        capr = capz
        rstarts = jnp.zeros((planes.shape[0], H_eff), jnp.int32)
    assert capr <= capz and capr % 128 == 0, (capr, capz)
    out = _fused_fusion_p(planes, z1t, starts, rstarts, wgt, bg, origin,
                          cell_size, k, radius_cells, tile_rows, capz,
                          capr, H, W, interpret, planes.shape[2], cascade,
                          slot_group)
    return jnp.transpose(out, (0, 2, 3, 1))


# --------------------------------------------------------------------------
# jnp twin (CPU path + parity reference)
# --------------------------------------------------------------------------

def fused_fusion_reference(bins: DenseBins, z1: jnp.ndarray,
                           wgt: jnp.ndarray, bg: jnp.ndarray,
                           origin: Tuple[float, float], cell_size: float,
                           k: int, radius_cells: int = 1) -> jnp.ndarray:
    """Pure-jnp twin of `fused_fusion` (no slab windowing: exact as long
    as the kernel's capz never overflows, which `slab_starts` reports).

    z1 here is the *untransposed* [B, P, hid] table.

    x/y/z ride the kernel's packed bf16 planes (the _D layout note);
    the twin applies the identical quantization (quantize_payload_xyz)
    BEFORE the KNN so selection, geo features, and outputs match the
    kernel exactly.
    """
    B, H, W, C, D = bins.data.shape
    hid = z1.shape[-1]

    def one(data, valid, z1_b):
        data = quantize_payload_xyz(data, origin, cell_size)
        nbr, nvalid, d2 = knn_select_dense(
            DenseBins(data, valid), origin, cell_size, k, radius_cells)
        nbr = nbr.reshape(H * W, k, D)
        nvalid = nvalid.reshape(H * W, k)
        d2 = d2.reshape(H * W, k)
        idx = nbr[..., 3].astype(jnp.int32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        cx = origin[0] + (rows.astype(jnp.float32) + 0.5) * cell_size
        cy = origin[1] + (cols.astype(jnp.float32) + 0.5) * cell_size
        cxy = jnp.stack([cx, cy], -1).reshape(H * W, 1, 2)
        # x/y/z were already quantized through quantize_payload_xyz
        # above, matching the kernel's packed planes bit-for-bit
        geo = jnp.concatenate(
            [nbr[..., :2] - cxy, nbr[..., 2:3],
             jnp.sqrt(jnp.minimum(d2, 1e6))[..., None]], axis=-1)  # [HW,k,4]

        z1g = z1_b[idx].astype(jnp.float32)                   # [HW, k, hid]
        g1 = geo @ wgt.T.astype(jnp.float32) + bg[:, 0]
        h = jnp.maximum(z1g + g1, 0.0)
        okf = nvalid.astype(jnp.float32)[..., None]
        acc = jnp.sum(h * okf, axis=1)                        # [HW, hid]
        cnt = jnp.sum(okf, axis=1)                            # [HW, 1]
        return jnp.concatenate([acc, cnt], axis=-1).reshape(H, W, hid + 1)

    return jax.vmap(one)(bins.data, bins.valid, z1)
