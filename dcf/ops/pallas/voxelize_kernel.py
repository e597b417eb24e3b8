"""Pallas TPU kernel: BEV pseudo-image rasterization
(SURVEY.md M6 kernel #1; BASELINE.json:5 "KITTI point-cloud voxelization /
BEV rasterization becomes a Pallas scatter kernel over an HBM-resident
pseudo-image").

TPUs have no scatter unit -- random writes serialize. This kernel turns
the scatter into MXU matmuls: points are pre-sorted by row-slab (a cheap
XLA argsort), each program DMAs its slab's point block into VMEM, and the
slab's output block is

    [occupancy(row, z) ; intensity-sum(row) ; count(row)] [RWS, CAP]
        @ col_onehot [CAP, W]

one matmul per slab, written straight to the HBM-resident pseudo-image.
Slab point ranges arrive via scalar prefetch; starts are rounded down to
lane alignment and the extra leading points are masked by their slab id.

Mosaic constraints honored (this toolchain's remote compiler crashes
without diagnostics otherwise): point fields travel as [8, P] planes
(points along lanes), DMA offsets are 128-aligned, and all masks are
built with 2-D broadcasted iota comparisons.

Parity: tests/test_pallas.py vs dcf.data.voxelize.rasterize_bev --
occupancy exact, intensity mean to matmul-accumulation tolerance;
overflow beyond the static per-slab capacity is dropped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcf.config import VoxelConfig


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _raster_kernel(starts_ref, pts_hbm, out_ref, scr, sem, *,
                   ROWS, W, NZ, CAP):
    """One program rasterizes a ROWS-row slab.

    starts_ref: [num_slabs] scalar-prefetch slab start offsets (aligned).
    pts_hbm:    [P_pad, 128] field columns: row, col, zslice, intensity,
                valid, slab_id in lanes 0-5 -- points along sublanes, so
                the runtime DMA offset lands on the (8-aligned) sublane
                axis; lane-dim runtime offsets crash this toolchain.
    out_ref:    [ROWS * (NZ + 1), W] slab block of the pseudo-image:
                ROWS*NZ occupancy rows (row-major, z-minor), ROWS means.
    scr:        [8, CAP] VMEM point block.
    """
    s = pl.program_id(0)
    start = starts_ref[s]

    cp = pltpu.make_async_copy(pts_hbm.at[pl.ds(start, CAP), :], scr, sem)
    cp.start()
    cp.wait()

    # field columns as [CAP, 1] (2-D everywhere; Mosaic rejects 1-D forms)
    prow = scr[:, 0:1].astype(jnp.int32)
    pcol = scr[:, 1:2].astype(jnp.int32)
    pz = scr[:, 2:3].astype(jnp.int32)
    inten = scr[:, 3:4]
    ok = (scr[:, 4:5] > 0.5) & (scr[:, 5:6].astype(jnp.int32) == s)
    lrow = prow - s * ROWS                           # row within slab

    # col one-hot [CAP, W]
    cols = jax.lax.broadcasted_iota(jnp.int32, (CAP, W), 1)
    col_oh = (cols == pcol).astype(jnp.float32)

    # transposed lhs [CAP, ROWS*(NZ+2)]: occupancy one-hots, intensity,
    # count; contracted over CAP by dot_general (no explicit transpose)
    code = jnp.where(ok, lrow * NZ + pz, -1)         # [CAP, 1]
    occ_iota = jax.lax.broadcasted_iota(jnp.int32, (CAP, ROWS * NZ), 1)
    occ_lhs = (occ_iota == code).astype(jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (CAP, ROWS), 1)
    row_hit = (row_iota == jnp.where(ok, lrow, -1))
    int_lhs = jnp.where(row_hit, inten, 0.0)
    cnt_lhs = row_hit.astype(jnp.float32)
    lhs_t = jnp.concatenate([occ_lhs, int_lhs, cnt_lhs], axis=1)

    prod = jax.lax.dot_general(
        lhs_t, col_oh, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    occ = jnp.minimum(prod[:ROWS * NZ], 1.0)         # any-hit
    sums = prod[ROWS * NZ:ROWS * (NZ + 1)]
    cnts = prod[ROWS * (NZ + 1):]
    mean = sums / jnp.maximum(cnts, 1.0)
    out_ref[...] = jnp.concatenate([occ, mean], axis=0)


@functools.partial(jax.jit, static_argnames=("cfg", "slab_rows", "cap",
                                             "interpret"))
def rasterize_bev_pallas(points: jnp.ndarray, mask: jnp.ndarray,
                         cfg: VoxelConfig, slab_rows: int = 8,
                         cap: int = 4096, interpret: bool = False
                         ) -> jnp.ndarray:
    """Drop-in Pallas twin of dcf.data.voxelize.rasterize_bev.

    Args:
      points: [P, 4] (x, y, z, intensity), zero-padded; mask: [P].
      slab_rows: BEV rows per program; cap: max points kept per slab
        (sorted overflow beyond the cap is dropped).

    Returns:
      [grid_x, grid_y, num_z_slices + 1] float32 pseudo-image.
    """
    gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
    assert gx % slab_rows == 0, (gx, slab_rows)
    num_slabs = gx // slab_rows
    P = points.shape[0]

    ix = jnp.floor((points[:, 0] - cfg.x_min) / cfg.voxel_size)
    iy = jnp.floor((points[:, 1] - cfg.y_min) / cfg.voxel_size)
    iz = jnp.floor((points[:, 2] - cfg.z_min) / cfg.z_slice_size)
    ix = ix.astype(jnp.int32)
    iy = iy.astype(jnp.int32)
    iz = iz.astype(jnp.int32)
    inb = (mask & (ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy)
           & (iz >= 0) & (iz < nz))
    slab = jnp.where(inb, ix // slab_rows, num_slabs)

    order = jnp.argsort(slab)
    planes = jnp.stack(
        [ix.astype(jnp.float32), iy.astype(jnp.float32),
         iz.astype(jnp.float32), points[:, 3], inb.astype(jnp.float32),
         slab.astype(jnp.float32)], axis=-1)[order]   # [P, 6] sorted
    sorted_slab = slab[order]
    P_pad = _round_up(P, 8) + cap
    planes = jnp.pad(planes, ((0, P_pad - P), (0, 122)))  # [P_pad, 128]

    # slab start offsets, rounded down to sublane alignment (the kernel
    # masks by slab id, so over-reading earlier points is harmless)
    starts = jnp.searchsorted(sorted_slab,
                              jnp.arange(num_slabs, dtype=jnp.int32))
    starts = jnp.minimum((starts // 8) * 8, P_pad - cap).astype(jnp.int32)

    kernel = functools.partial(_raster_kernel, ROWS=slab_rows, W=gy,
                               NZ=nz, CAP=cap)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_slabs,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((slab_rows * (nz + 1), gy),
                               lambda s, starts: (s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cap, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((gx * (nz + 1), gy), jnp.float32),
        interpret=interpret,
    )(starts, planes)

    # block layout: [r * NZ + z] occupancy rows, then ROWS mean rows
    blk = out.reshape(num_slabs, slab_rows * (nz + 1), gy)
    occ = (blk[:, :slab_rows * nz]
           .reshape(num_slabs, slab_rows, nz, gy)
           .transpose(0, 1, 3, 2).reshape(gx, gy, nz))
    mean = blk[:, slab_rows * nz:].reshape(gx, gy, 1)
    return jnp.concatenate([occ, mean], axis=-1)
