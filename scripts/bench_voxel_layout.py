"""Rasterizer output-layout microbench (dev tool, real TPU).

The pseudo-image is [gx, gy, nz+1] with a 21-channel minor dim -> TPU
pads channels to 128 lanes; the flat-scatter + reshape + concat path
pays linear->tiled relayout copies (~2.7 ms/frame in the train-step
profile, voxelize.py:104/113). This measures rasterize + the first BEV
conv (the consumer that fixes the required layout) under variants:

  a) production: flat 1D scatter -> reshape -> concat (NHWC conv)
  b) direct 3D scatter into [gx, gy, nz] -> concat (NHWC conv)
  c) channel-major [nz+1, gx, gy] compact scatter -> NCHW conv
  d) channel-major scatter -> explicit transpose -> NHWC conv

Usage: python scripts/bench_voxel_layout.py [batch]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dcf.config import multi_scale_config
from dcf.data.synthetic import make_varied_frame
from dcf.data.voxelize import crop_and_pad, rasterize_bev
from dcf.utils.profiling import device_latency

DTYPE = jnp.bfloat16


def _indices(points, mask, cfg):
    gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
    ix = jnp.floor((points[:, 0] - cfg.x_min) / cfg.voxel_size).astype(
        jnp.int32)
    iy = jnp.floor((points[:, 1] - cfg.y_min) / cfg.voxel_size).astype(
        jnp.int32)
    iz = jnp.floor((points[:, 2] - cfg.z_min) / cfg.z_slice_size).astype(
        jnp.int32)
    inb = (mask & (ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy)
           & (iz >= 0) & (iz < nz))
    return ix, iy, iz, inb


def _intensity(points, ix, iy, inb, cfg):
    gx, gy = cfg.grid_x, cfg.grid_y
    cell = jnp.where(inb, ix * gy + iy, gx * gy)
    s = jnp.zeros((gx * gy,), jnp.float32).at[cell].add(
        jnp.where(inb, points[:, 3], 0.0), mode="drop")
    c = jnp.zeros((gx * gy,), jnp.float32).at[cell].add(
        jnp.where(inb, 1.0, 0.0), mode="drop")
    return (s / jnp.maximum(c, 1.0)).reshape(gx, gy)


def raster_direct3d(points, mask, cfg):
    gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
    ix, iy, iz, inb = _indices(points, mask, cfg)
    ixs = jnp.where(inb, ix, gx)
    occ = jnp.zeros((gx, gy, nz), DTYPE).at[ixs, iy, iz].max(
        jnp.asarray(1.0, DTYPE), mode="drop")
    inten = _intensity(points, ix, iy, inb, cfg)
    return jnp.concatenate([occ, inten[:, :, None].astype(DTYPE)], axis=-1)


def raster_cmajor(points, mask, cfg):
    gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
    ix, iy, iz, inb = _indices(points, mask, cfg)
    flat = jnp.where(inb, (iz * gx + ix) * gy + iy, nz * gx * gy)
    occ = jnp.zeros((nz * gx * gy,), DTYPE).at[flat].max(
        jnp.asarray(1.0, DTYPE), mode="drop").reshape(nz, gx, gy)
    inten = _intensity(points, ix, iy, inb, cfg)
    return jnp.concatenate([occ, inten[None].astype(DTYPE)], axis=0)


def raster_fused_buf(points, mask, cfg):
    """Variant e: occupancy scattered straight into a [gx, gy, nz+1]
    buffer, intensity written into channel nz by dynamic-update-slice —
    no concatenate, so no full-pseudo-image copy."""
    gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
    ix, iy, iz, inb = _indices(points, mask, cfg)
    ixs = jnp.where(inb, ix, gx)
    out = jnp.zeros((gx, gy, nz + 1), DTYPE)
    out = out.at[ixs, iy, iz].max(jnp.asarray(1.0, DTYPE), mode="drop")
    inten = _intensity(points, ix, iy, inb, cfg)
    return out.at[:, :, nz].set(inten.astype(DTYPE))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = multi_scale_config()
    v = cfg.voxel
    pts, msk = [], []
    for i in range(B):
        f = make_varied_frame(seed=i)
        p, m = crop_and_pad(f.points, v)
        pts.append(p)
        msk.append(m)
    points = jnp.asarray(np.stack(pts))
    mask = jnp.asarray(np.stack(msk))
    C0 = cfg.backbone.bev_stage_channels[0]
    k = jax.random.normal(jax.random.key(0),
                          (3, 3, v.num_z_slices + 1, C0), DTYPE) * 0.05

    def conv_nhwc(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def conv_nchw(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NCHW", "HWIO", "NCHW"),
            preferred_element_type=jnp.float32)

    variants = {
        "a_flat_reshape_nhwc": lambda p, m: conv_nhwc(
            jax.vmap(lambda pp, mm: rasterize_bev(pp, mm, v, DTYPE))(p, m)),
        "b_direct3d_nhwc": lambda p, m: conv_nhwc(
            jax.vmap(lambda pp, mm: raster_direct3d(pp, mm, v))(p, m)),
        "c_cmajor_nchw": lambda p, m: conv_nchw(
            jax.vmap(lambda pp, mm: raster_cmajor(pp, mm, v))(p, m)),
        "d_cmajor_transpose_nhwc": lambda p, m: conv_nhwc(
            jnp.transpose(
                jax.vmap(lambda pp, mm: raster_cmajor(pp, mm, v))(p, m),
                (0, 2, 3, 1))),
        "e_fusedbuf_nhwc": lambda p, m: conv_nhwc(
            jax.vmap(lambda pp, mm: raster_fused_buf(pp, mm, v))(p, m)),
    }
    # parity first (sums agree; occupancy/intensity identical content)
    outs = {}
    jitted = {}
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        jitted[name] = jfn
        o = jfn(points, mask)
        outs[name] = np.asarray(
            o.sum(axis=(0, 2, 3)) if name == "c_cmajor_nchw"
            else o.sum(axis=(0, 1, 2)), np.float32)
    for name, s in outs.items():
        np.testing.assert_allclose(s, outs["a_flat_reshape_nhwc"],
                                   rtol=2e-2), name

    # latency: jitted, scalar output (full-tensor fetches over the tunnel
    # would swamp the chain; device_latency's barrier is the fetch)
    for name, fn in variants.items():
        scalar = jax.jit(lambda p, m, f=fn: f(p, m).sum())
        ms = device_latency(scalar, (points, mask)) * 1000.0
        print(f"{name}: {ms:.3f} ms (B={B}, raster + first conv)",
              flush=True)


if __name__ == "__main__":
    main()
