"""BEV voxelizer tests (SURVEY.md 4.1/4.2): handcrafted + torch oracle."""

import numpy as np
import jax.numpy as jnp
import torch

from dcf.config import VoxelConfig
from dcf.data.voxelize import (crop_and_pad, rasterize_bev,
                               rasterize_bev_batch, rasterize_bev_s2d)


def small_cfg():
    return VoxelConfig(x_min=0, x_max=4, y_min=-2, y_max=2, z_min=-1,
                       z_max=1, voxel_size=1.0, z_slice_size=0.5,
                       max_points=32)


class TestCropAndPad:
    def test_crop_bounds(self):
        cfg = small_cfg()
        pts = np.array([
            [1.0, 0.0, 0.0, 0.5],     # in
            [5.0, 0.0, 0.0, 0.5],     # x out
            [1.0, 3.0, 0.0, 0.5],     # y out
            [1.0, 0.0, 2.0, 0.5],     # z out
        ], np.float32)
        out, mask = crop_and_pad(pts, cfg)
        assert out.shape == (32, 4) and mask.shape == (32,)
        assert mask.sum() == 1
        np.testing.assert_allclose(out[0], pts[0])

    def test_overflow_subsamples(self, rng):
        cfg = small_cfg()
        pts = np.zeros((100, 4), np.float32)
        pts[:, 0] = rng.uniform(0.1, 3.9, 100)
        pts[:, 1] = rng.uniform(-1.9, 1.9, 100)
        out, mask = crop_and_pad(pts, cfg)
        assert mask.all()
        assert out.shape == (32, 4)


class TestRasterize:
    def test_handcrafted(self):
        cfg = small_cfg()
        pts = np.zeros((32, 4), np.float32)
        mask = np.zeros((32,), bool)
        # two points in cell (ix=1, iy=2): z slices 0 and 3, intensities
        pts[0] = [1.5, 0.5, -0.9, 0.2]   # z slice 0
        pts[1] = [1.5, 0.5, 0.8, 0.6]    # z slice 3
        mask[:2] = True
        img = np.asarray(rasterize_bev(jnp.asarray(pts), jnp.asarray(mask),
                                       cfg))
        assert img.shape == (4, 4, cfg.num_z_slices + 1) == (4, 4, 5)
        assert img[1, 2, 0] == 1.0 and img[1, 2, 3] == 1.0
        assert img[1, 2, 1] == 0.0 and img[1, 2, 2] == 0.0
        np.testing.assert_allclose(img[1, 2, 4], 0.4, atol=1e-6)  # mean
        # everything else empty
        total = img.sum()
        np.testing.assert_allclose(total, 1.0 + 1.0 + 0.4, atol=1e-6)

    def test_against_torch_oracle(self, rng):
        cfg = VoxelConfig(x_min=0, x_max=8, y_min=-4, y_max=4, z_min=-1,
                          z_max=1, voxel_size=0.5, z_slice_size=0.5,
                          max_points=256)
        pts = np.zeros((256, 4), np.float32)
        pts[:, 0] = rng.uniform(-1, 9, 256)
        pts[:, 1] = rng.uniform(-5, 5, 256)
        pts[:, 2] = rng.uniform(-1.5, 1.5, 256)
        pts[:, 3] = rng.uniform(0, 1, 256)
        mask = rng.uniform(size=256) < 0.9

        got = np.asarray(rasterize_bev(jnp.asarray(pts), jnp.asarray(mask),
                                       cfg))

        # torch oracle (independent impl with index_put_ accumulate)
        t = torch.from_numpy(pts)
        m = torch.from_numpy(mask)
        gx, gy, nz = cfg.grid_x, cfg.grid_y, cfg.num_z_slices
        ix = torch.floor((t[:, 0] - cfg.x_min) / cfg.voxel_size).long()
        iy = torch.floor((t[:, 1] - cfg.y_min) / cfg.voxel_size).long()
        iz = torch.floor((t[:, 2] - cfg.z_min) / cfg.z_slice_size).long()
        inb = (m & (ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy)
               & (iz >= 0) & (iz < nz))
        occ = torch.zeros(gx, gy, nz)
        occ[ix[inb], iy[inb], iz[inb]] = 1.0
        s = torch.zeros(gx, gy)
        c = torch.zeros(gx, gy)
        s.index_put_((ix[inb], iy[inb]), t[inb, 3], accumulate=True)
        c.index_put_((ix[inb], iy[inb]), torch.ones(int(inb.sum())),
                     accumulate=True)
        inten = s / c.clamp(min=1.0)
        want = torch.cat([occ, inten[..., None]], dim=-1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_s2d_matches_reference(self, rng):
        """rasterize_bev_s2d == space-to-depth(2) of rasterize_bev."""
        cfg = VoxelConfig(x_min=0, x_max=8, y_min=-4, y_max=4, z_min=-1,
                          z_max=1, voxel_size=0.5, z_slice_size=0.5,
                          max_points=256)
        pts = np.zeros((256, 4), np.float32)
        pts[:, 0] = rng.uniform(-1, 9, 256)
        pts[:, 1] = rng.uniform(-5, 5, 256)
        pts[:, 2] = rng.uniform(-1.5, 1.5, 256)
        pts[:, 3] = rng.uniform(0, 1, 256)
        mask = rng.uniform(size=256) < 0.9

        ref = np.asarray(rasterize_bev(jnp.asarray(pts), jnp.asarray(mask),
                                       cfg))
        gx, gy, C = ref.shape
        want = (ref.reshape(gx // 2, 2, gy // 2, 2, C)
                .transpose(0, 2, 1, 3, 4)
                .reshape(gx // 2, gy // 2, 4 * C))
        got = np.asarray(rasterize_bev_s2d(jnp.asarray(pts),
                                           jnp.asarray(mask), cfg))
        np.testing.assert_allclose(got, want)

    def test_batch_matches_single(self, rng):
        cfg = small_cfg()
        pts = rng.uniform(-1, 5, (2, 32, 4)).astype(np.float32)
        mask = rng.uniform(size=(2, 32)) < 0.8
        batched = np.asarray(rasterize_bev_batch(
            jnp.asarray(pts), jnp.asarray(mask), cfg))
        for b in range(2):
            single = np.asarray(rasterize_bev(
                jnp.asarray(pts[b]), jnp.asarray(mask[b]), cfg))
            np.testing.assert_allclose(batched[b], single)
