"""Scatter cost model probe (dev tool): fixed overhead vs per-update.

The four per-scale `_scatter_planes` binning scatters are the largest
post-round-4 inference bucket (~0.5 ms each, BASELINE.md). Two candidate
levers cut different terms of `cost = fixed + per_update * N`:
  - payload packing (D 4 -> 3) cuts N by 25%;
  - one fused multi-scale scatter cuts 4x fixed to 1x.
This probe times the production scatter shape at D in {4, 3, 2} and a
single fused 4-scale scatter, so the lever is chosen from data.

Usage: python scripts/bench_scatter_scaling.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dcf.ops.pallas.fusion_kernel import _plane_geometry
from dcf.utils.profiling import device_latency

P = 24576
C, R, TR = 8, 1, 8
SCALES = [(352, 400), (176, 200), (88, 100), (44, 50)]


def scatter_one(vals, base, D, plane):
    idx = (base[None, :] + plane * jnp.arange(D, dtype=jnp.int32)[:, None]
           ).reshape(-1)
    flat = jnp.zeros((D * plane,), jnp.float32)
    flat = flat.at[idx].set(vals[:D].reshape(-1), mode="drop",
                            unique_indices=True)
    return flat[:8]          # small fetch; scatter itself can't be DCE'd


def main():
    rng = np.random.default_rng(0)
    geoms = [_plane_geometry(H, W, R, TR) for H, W in SCALES]
    planes = [C * g[4] * g[3] for g in geoms]  # C * RP * WP
    vals = jnp.asarray(rng.normal(size=(4, P)).astype(np.float32))
    bases = [jnp.asarray(rng.integers(0, pl, size=P).astype(np.int32))
             for pl in planes]

    # per-scale scatters at varying D
    for D in (4, 3, 2):
        tot = 0.0
        for pl, base in zip(planes, bases):
            fn = jax.jit(functools.partial(scatter_one, D=D, plane=pl))
            ms = device_latency(fn, (vals, base)) * 1e3
            tot += ms
        print(f"D={D}: four per-scale scatters total {tot:.3f} ms "
              f"({tot / 4:.3f} ms each)")

    # one fused scatter across all four scales (D=4)
    off = np.cumsum([0] + [4 * pl for pl in planes])
    total = int(off[-1])

    @jax.jit
    def fused(vals, b0, b1, b2, b3):
        idx_all = []
        val_all = []
        for i, (b, pl) in enumerate(zip((b0, b1, b2, b3), planes)):
            idx = (b[None, :] + pl * jnp.arange(4, dtype=jnp.int32)[:, None]
                   ).reshape(-1) + int(off[i])
            idx_all.append(idx)
            val_all.append(vals.reshape(-1))
        flat = jnp.zeros((total,), jnp.float32)
        return flat.at[jnp.concatenate(idx_all)].set(
            jnp.concatenate(val_all), mode="drop",
            unique_indices=True)[:8]

    ms = device_latency(fused, (vals, *bases)) * 1e3
    print(f"fused single scatter (4 scales, D=4): {ms:.3f} ms")

    # update-count scaling at the finest scale only (isolate linearity)
    pl = planes[0]
    for mult in (1, 2, 4):
        Pm = P * mult
        v = jnp.asarray(rng.normal(size=(4 * Pm,)).astype(np.float32))
        b = jnp.asarray(rng.integers(0, 4 * pl, size=4 * Pm)
                        .astype(np.int32))

        @jax.jit
        def one(v, b):
            return jnp.zeros((4 * pl,), jnp.float32).at[b].set(
                v, mode="drop", unique_indices=True)[:8]

        ms = device_latency(one, (v, b)) * 1e3
        print(f"flat scatter, {4 * Pm} updates into 4*plane(s2): "
              f"{ms:.3f} ms ({ms * 1e6 / (4 * Pm):.1f} ns/update)")


if __name__ == "__main__":
    main()
