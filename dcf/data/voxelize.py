"""BEV voxelization / pseudo-image rasterization (SURVEY.md D3).

PIXOR-style input parameterization (the paper's): the ROI point cloud is
scattered into a BEV pseudo-image with one binary-occupancy channel per
height slice plus a mean-intensity channel.

Host side, `crop_and_pad` turns a variable-N cloud into the framework's
static `(points[max_points, 4], mask[max_points])` pair (SURVEY.md "static
shapes everywhere"). Device side, `rasterize_bev` (unique-indices sorted
scatter) is THE production rasterizer: a Pallas slab-kernel twin was
built and parity-tested in round 1 but measured 3x slower on v5e (XLA's
unique-scatter is already bandwidth-optimal here), so it was retired --
see VoxelConfig's note and BASELINE.md.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcf.config import VoxelConfig


def crop_and_pad(points: np.ndarray, cfg: VoxelConfig,
                 shuffle: bool = False, seed: int = 0
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side ROI crop + static-shape padding.

    Args:
      points: [N, 4] float32 (x, y, z, intensity).

    Returns:
      (points[max_points, 4], mask[max_points] bool). Out-of-ROI points are
      dropped; clouds larger than max_points are subsampled (deterministic
      unless shuffle), smaller ones zero-padded with mask False.
    """
    points = np.asarray(points, np.float32).reshape(-1, 4)
    if not shuffle:
        # native fast path (dcf/native); falls through to numpy when the
        # crop overflows max_points (subsampling policy lives here)
        from dcf import native
        res = native.crop_pad(
            points, (cfg.x_min, cfg.x_max, cfg.y_min, cfg.y_max,
                     cfg.z_min, cfg.z_max), cfg.max_points)
        if res is not None:
            out, mask = res
            if not mask.all():          # no overflow happened
                return out, mask
    keep = ((points[:, 0] >= cfg.x_min) & (points[:, 0] < cfg.x_max)
            & (points[:, 1] >= cfg.y_min) & (points[:, 1] < cfg.y_max)
            & (points[:, 2] >= cfg.z_min) & (points[:, 2] < cfg.z_max))
    pts = points[keep]
    if shuffle or len(pts) > cfg.max_points:
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(pts))
        pts = pts[order[:cfg.max_points]]
    out = np.zeros((cfg.max_points, 4), np.float32)
    mask = np.zeros((cfg.max_points,), bool)
    n = min(len(pts), cfg.max_points)
    out[:n] = pts[:n]
    mask[:n] = True
    return out, mask


def rasterize_bev(points: jnp.ndarray, mask: jnp.ndarray,
                  cfg: VoxelConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Scatter padded points into the BEV pseudo-image (jnp reference).

    Args:
      points: [P, 4] (x, y, z, intensity), zero-padded.
      mask: [P] bool validity.
      dtype: output (and occupancy-scatter) dtype. The detector passes
        its compute dtype (bf16): the pseudo-image is 47 MB/frame in
        fp32, and scattering/reshaping/concatenating it in bf16 halves
        the rasterizer's HBM traffic with zero information loss
        (occupancy is exactly 0/1; intensity still accumulates in fp32
        and only the final mean is cast).

    Returns:
      [grid_x, grid_y, num_z_slices + 1] `dtype` pseudo-image:
      channels [0, nz) are per-slice occupancy, channel nz is the mean
      intensity of the points in the BEV cell (0 where empty).
    """
    gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
    inv_vox = 1.0 / cfg.voxel_size
    inv_slice = 1.0 / cfg.z_slice_size
    ix = jnp.floor((points[:, 0] - cfg.x_min) * inv_vox).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - cfg.y_min) * inv_vox).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - cfg.z_min) * inv_slice).astype(jnp.int32)
    inb = (mask & (ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy)
           & (iz >= 0) & (iz < nz))

    cell = ix * gy + iy                                   # [P]
    # Out-of-bounds sentinel: scatter with mode="drop" (ix=gx is OOB, so
    # the whole update drops regardless of iy/iz).
    cell_i = jnp.where(inb, cell, gx * gy)

    # Occupancy scatters DIRECTLY into the tiled [gx, gy, nz] output: a
    # flat [gx*gy*nz] scatter + reshape forces XLA to emit a linear ->
    # tiled relayout copy of the whole 21-channel pseudo-image (measured
    # 4.54 -> 3.18 ms for raster + first conv at B=2 on v5e,
    # scripts/bench_voxel_layout.py; channel-major variants lose to the
    # NHWC conv's input layout).
    ixs = jnp.where(inb, ix, gx)
    occ = jnp.zeros((gx, gy, nz), dtype)
    occ = occ.at[ixs, iy, iz].max(jnp.asarray(1.0, dtype), mode="drop")

    # intensity sum + count ride ONE scatter-add of [P, 2] rows (same
    # indices, same per-cell addition order as two separate scatters ->
    # bit-identical means at half the scatter cost)
    pair = jnp.zeros((gx * gy, 2), jnp.float32)
    pair = pair.at[cell_i].add(
        jnp.stack([jnp.where(inb, points[:, 3], 0.0),
                   jnp.where(inb, 1.0, 0.0)], axis=-1), mode="drop")
    inten = (pair[:, 0] / jnp.maximum(pair[:, 1], 1.0)).reshape(gx, gy, 1)

    return jnp.concatenate([occ, inten.astype(dtype)], axis=-1)


def rasterize_bev_s2d(points: jnp.ndarray, mask: jnp.ndarray,
                      cfg: VoxelConfig, dtype=jnp.float32) -> jnp.ndarray:
    """`rasterize_bev` emitted directly in space-to-depth(2) layout.

    Output [gx/2, gy/2, 4*(nz+1)] with channel (a*2 + b)*(nz+1) + c ==
    `rasterize_bev(...)[2p+a, 2q+b, c]` — bit-identical to s2d of the
    reference raster (tested), but scattered straight into the layout
    the BEV stage-0 conv consumes. The full-res [704, 800, 21] raster
    forced XLA to relayout-copy the whole pseudo-image TWICE at the
    stage-0 conv + its projection shortcut (2 x 0.49 ms at B=1 on v5e);
    in s2d form stage 0 runs stride 1 on an 84-channel input (better
    MXU lane utilization than 21) with no relayout. Points scatter with
    the same update count as the reference raster, so the scatter cost
    is unchanged.
    """
    gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
    gxh, gyh = gx // 2, gy // 2
    inv_vox = 1.0 / cfg.voxel_size
    inv_slice = 1.0 / cfg.z_slice_size
    ix = jnp.floor((points[:, 0] - cfg.x_min) * inv_vox).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - cfg.y_min) * inv_vox).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - cfg.z_min) * inv_slice).astype(jnp.int32)
    inb = (mask & (ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy)
           & (iz >= 0) & (iz < nz))

    ixh = ix >> 1
    iyh = iy >> 1
    blk = (ix & 1) * 2 + (iy & 1)                          # s2d channel block
    C = nz + 1

    # occupancy straight into the s2d channel position (drop via OOB row)
    ixs = jnp.where(inb, ixh, gxh)
    occ = jnp.zeros((gxh, gyh, 4, nz), dtype)
    occ = occ.at[ixs, iyh, blk, iz].max(jnp.asarray(1.0, dtype),
                                        mode="drop")

    # mean intensity per ORIGINAL cell == per (s2d pixel, block) slot
    cell = (ixh * gyh + iyh) * 4 + blk
    cell_i = jnp.where(inb, cell, gxh * gyh * 4)
    # one [P, 2]-row scatter-add for (intensity sum, count) -- same
    # indices and per-cell addition order as two scalar scatters, so
    # the mean is bit-identical at half the scatter cost
    pair = jnp.zeros((gxh * gyh * 4, 2), jnp.float32)
    pair = pair.at[cell_i].add(
        jnp.stack([jnp.where(inb, points[:, 3], 0.0),
                   jnp.where(inb, 1.0, 0.0)], axis=-1), mode="drop")
    inten = (pair[:, 0] / jnp.maximum(pair[:, 1], 1.0)
             ).reshape(gxh, gyh, 4, 1)

    return jnp.concatenate([occ, inten.astype(dtype)],
                           axis=-1).reshape(gxh, gyh, 4 * C)


def rasterize_bev_batch(points: jnp.ndarray, mask: jnp.ndarray,
                        cfg: VoxelConfig, dtype=jnp.float32,
                        s2d: bool = False) -> jnp.ndarray:
    """[B, P, 4] x [B, P] -> [B, gx, gy, C] (or the s2d layout)."""
    fn = rasterize_bev_s2d if s2d else rasterize_bev
    return jax.vmap(lambda p, m: fn(p, m, cfg, dtype))(points, mask)
