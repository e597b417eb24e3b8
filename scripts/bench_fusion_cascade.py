"""Standalone fusion-kernel cascade A/B bench (dev tool).

Times `fused_fusion_planes` forward at the flagship per-scale shapes for
the cascade variants (onepass vs twopass at slot_group 1/2/4) without
paying a full-model compile per variant. Cascade time is data-independent
(static loops), so random inputs give valid timings.

Usage: python scripts/bench_fusion_cascade.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dcf.ops.pallas.fusion_kernel import (_plane_geometry, bin_points_planes,
                                          fused_fusion_planes,
                                          fusion_windows)
from dcf.utils.profiling import device_latency

GX, GY = 704, 800          # flagship grid (voxel 0.1, 70.4 x 80 m)
P = 24576
HID, K, C, R, TR = 64, 4, 8, 1, 8
ZCAP = 1536
RCAP = 512


def make_scale(stride, rng):
    H, W = GX // stride, GY // stride
    cell = 0.1 * stride
    ratio = stride // 2
    capz = min(ZCAP * ratio, P)
    pts = np.zeros((P, 4), np.float32)
    pts[:, 0] = rng.uniform(0, GX * 0.1, P)
    pts[:, 1] = rng.uniform(-40, 40, P)
    pts[:, 2] = rng.uniform(-2, 1, P)
    mask = rng.uniform(size=P) < 0.8
    # fine-sort (stride 2 cells)
    fx = np.floor(pts[:, 0] / 0.2).astype(np.int64)
    fy = np.floor((pts[:, 1] + 40) / 0.2).astype(np.int64)
    Hf, Wf = GX // 2, GY // 2
    ing = mask & (fx >= 0) & (fx < Hf) & (fy >= 0) & (fy < Wf)
    key = np.where(ing, fx * Wf + fy, Hf * Wf)
    order = np.argsort(key, kind="stable")
    pts, mask = pts[order], mask[order]
    fine_row = np.where(ing, fx, 1 << 20)[order]
    pts[:, 3] = np.arange(P)

    planes = bin_points_planes(jnp.asarray(pts), jnp.asarray(mask),
                               (0.0, -40.0), cell, (H, W), C, R, TR)
    TH, H_eff, _, _, _ = _plane_geometry(H, W, R, TR)
    NS = H_eff // TH
    capr = min(RCAP * ratio, capz)
    starts, rstarts, over = fusion_windows(jnp.asarray(fine_row), NS, TH,
                                           R, ratio, capz, capr, P)
    print(f"  s{stride}: row-window overflow {int(jnp.sum(over))}")
    z1t = jnp.asarray(rng.normal(size=(1, HID, P)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(size=(HID, 4)) * 0.3, jnp.float32)
    bg = jnp.zeros((HID, 1), jnp.float32)
    return (planes[None], z1t, starts[None], rstarts[None], wgt, bg,
            cell, H, W, capz, capr)


def main():
    rng = np.random.default_rng(0)
    scales = {s: make_scale(s, rng) for s in (2, 4, 8, 16)}
    variants = [("onepass", 0), ("twopass", 1), ("twopass", 2),
                ("twopass", 4)]
    print(f"{'variant':>12} " + " ".join(f"s{s:<2}" for s in scales)
          + "   total(ms)")
    for cas, sg in variants:
        for windowed in (False, True):
            total = 0.0
            cols = []
            for s, (planes, z1t, starts, rstarts, wgt, bg, cell, H, W,
                    capz, capr) in scales.items():
                part = functools.partial(
                    fused_fusion_planes, origin=(0.0, -40.0),
                    cell_size=cell, k=K, H=H, W=W, radius_cells=R,
                    tile_rows=TR, capz=capz, cascade=cas, slot_group=sg,
                    capr=capr if windowed else None)
                fn = jax.jit(lambda p, z, st, rs, w, b, _p=part:
                             _p(p, z, st, w, b,
                                rstarts=rs if windowed else None).sum())
                ms = 1e3 * device_latency(
                    fn, (planes, z1t, starts, rstarts, wgt, bg))
                total += ms
                cols.append(f"{ms:5.2f}")
            name = cas if cas == "onepass" else f"{cas}-sg{sg}"
            name += "-rw" if windowed else ""
            print(f"{name:>15} " + " ".join(cols) + f"   {total:6.2f}")


if __name__ == "__main__":
    main()
