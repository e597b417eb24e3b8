"""Pallas TPU kernel: streaming K-nearest-neighbor selection
(SURVEY.md M6 kernel #2 core; BASELINE.json:5 "per-BEV-pixel KNN ...
fused into single Pallas kernels at each backbone scale").

PARITY REFERENCE ONLY -- not on any production path. The production KNN
lives inside the fused per-scale fusion kernel (fusion_kernel.py), which
embeds the same insertion cascade; this standalone kernel is kept as the
test-exercised stepping stone that documents and validates the cascade
in isolation (tests/test_pallas.py). Do not wire it into the model.

Standalone behavior -- the jnp `knn_select_dense` twin (dcf.ops.knn) at
each fusion scale: for every BEV pixel, the K nearest binned lidar points from the
(2r+1)^2-cell neighborhood, selected in ONE streaming pass with a
vectorized insertion cascade -- no [H, W, 9C] distance materialization,
no sorts, no gathers (the jnp twin's XLA lowerings -- top_k,
take_along_axis, masked-sum extraction -- cost ~19 ms at stride 2).

TPU/Mosaic specifics discovered on this toolchain:
- DMAs must be tile-aligned (unaligned `pl.ds` offsets crash the
  compiler), so each program copies an aligned, halo-covering row slab of
  the field planes and realizes the (di, dj) window shifts *in VMEM* with
  `pltpu.roll`. Rolled wrap-around always lands in the zero-validity
  padding (r <= lane/sublane pad), so it never fabricates candidates.
- Payloads travel as per-field slot planes [D+1, C, rows, lanes]
  (a [H, W, C, D] block with a 4-wide minor axis also fails to compile).

Parity: tests/test_pallas.py checks agreement with knn_select_dense
(interpret mode on CPU; compiled on TPU via the model/bench path).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcf.ops.knn import DenseBins

_BIG = 1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _roll2(x, di, dj):
    """x[i, j] <- x[i + di, j + dj] (circular; wraps land in padding).
    pltpu.roll requires non-negative shifts: left-shift by d == right-shift
    by size - d."""
    if di:
        x = pltpu.roll(x, x.shape[0] - di, 0)
    if dj:
        x = pltpu.roll(x, x.shape[1] - dj, 1)
    return x


def _knn_kernel(planes_hbm, out_ref, scr, sem, *,
                TH, TS, W, WP, C, D, K, r, origin, cell_size):
    """One program computes a (TH, W) pixel slab of one batch element.

    planes_hbm: [B, D+1, C, RP, WP] field planes (validity last; zero pad
                r cols left, r rows top, rest right/bottom).
    out_ref:    [D+2, K, TH, W] output block.
    scr:        [D+1, C, TS, WP] VMEM scratch (TS = aligned halo slab).
    """
    b = pl.program_id(0)
    ti = pl.program_id(1)

    cp = pltpu.make_async_copy(
        planes_hbm.at[b, :, :, pl.ds(ti * TH, TS), :], scr, sem)
    cp.start()
    cp.wait()

    rows = jax.lax.broadcasted_iota(jnp.int32, (TH, WP), 0) + ti * TH
    cols = jax.lax.broadcasted_iota(jnp.int32, (TH, WP), 1)
    cx = origin[0] + (rows.astype(jnp.float32) + 0.5) * cell_size
    cy = origin[1] + (cols.astype(jnp.float32) + 0.5) * cell_size

    top_d = [jnp.full((TH, WP), _BIG, jnp.float32) for _ in range(K)]
    top_p = [[jnp.zeros((TH, WP), jnp.float32) for _ in range(D)]
             for _ in range(K)]

    win = 2 * r + 1
    for c in range(C):
        fields = [scr[f, c] for f in range(D + 1)]           # [TS, WP]
        for di in range(win):
            for dj in range(win):
                sh = [_roll2(f, di, dj)[:TH, :] for f in fields]
                px, py = sh[0], sh[1]
                v = sh[D] > 0.5
                ddx = px - cx
                ddy = py - cy
                d = jnp.where(v, ddx * ddx + ddy * ddy,
                              jnp.float32(_BIG))
                p = sh[:D]
                # insertion cascade: bubble (d, p) down the sorted list
                for k in range(K):
                    closer = d < top_d[k]
                    new_d = jnp.minimum(d, top_d[k])
                    d = jnp.maximum(d, top_d[k])
                    top_d[k] = new_d
                    for f in range(D):
                        new_f = jnp.where(closer, p[f], top_p[k][f])
                        p[f] = jnp.where(closer, top_p[k][f], p[f])
                        top_p[k][f] = new_f

    for k in range(K):
        ok = top_d[k] < _BIG
        for f in range(D):
            out_ref[0, f, k] = top_p[k][f][:, :W]
        out_ref[0, D, k] = ok.astype(jnp.float32)[:, :W]
        out_ref[0, D + 1, k] = jnp.where(ok, top_d[k], jnp.inf)[:, :W]


@functools.partial(jax.jit, static_argnames=(
    "origin", "cell_size", "k", "radius_cells", "tile_rows", "interpret"))
def knn_select_pallas(bins: DenseBins, origin: Tuple[float, float],
                      cell_size: float, k: int, radius_cells: int = 1,
                      tile_rows: int = 8, interpret: bool = False
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in Pallas twin of dcf.ops.knn.knn_select_dense, batched.

    Accepts bins with or without a leading batch axis. Returns
    (nbr [..., H, W, k, D], valid [..., H, W, k] bool, dist2 [..., H, W, k]).
    """
    batched = bins.data.ndim == 5
    if not batched:
        bins = DenseBins(bins.data[None], bins.valid[None])
    B, H, W, C, D = bins.data.shape
    r = radius_cells
    TH = min(tile_rows, _round_up(H, 8))
    H_eff = _round_up(H, TH)               # grid-aligned row count
    TS = _round_up(TH + 2 * r, 8)          # aligned halo slab rows
    WP = _round_up(W + 2 * r, 128)
    RP = (H_eff // TH - 1) * TH + TS       # rows needed by the last tile

    # [B, H, W, C, D] -> [B, D+1, C, RP, WP] field planes (validity last),
    # zero-padded r rows/cols at the top/left, aligned slack elsewhere.
    planes = jnp.transpose(bins.data.astype(jnp.float32), (0, 4, 3, 1, 2))
    planes = jnp.concatenate(
        [planes, jnp.transpose(bins.valid.astype(jnp.float32),
                               (0, 3, 1, 2))[:, None]], axis=1)
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (r, RP - H - r),
                              (r, WP - W - r)))

    kernel = functools.partial(
        _knn_kernel, TH=TH, TS=TS, W=W, WP=WP, C=C, D=D, K=k, r=r,
        origin=origin, cell_size=cell_size)
    out = pl.pallas_call(
        kernel,
        grid=(B, H_eff // TH),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, D + 2, k, TH, W),
                               lambda b, i: (b, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D + 2, k, H_eff, W),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D + 1, C, TS, WP), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(planes)
    out = out[:, :, :, :H]
    nbr = jnp.transpose(out[:, :D], (0, 3, 4, 2, 1))    # [B, H, W, k, D]
    valid = jnp.transpose(out[:, D], (0, 2, 3, 1)) > 0.5
    d2 = jnp.transpose(out[:, D + 1], (0, 2, 3, 1))
    if not batched:
        return nbr[0], valid[0], d2[0]
    return nbr, valid, d2
