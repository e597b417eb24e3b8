"""Pallas kernel vs jnp twin parity (SURVEY.md 4.3).

Runs in interpret mode on the CPU test backend; the same kernels compile
for real on TPU (exercised by bench/ and the flagship model path).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dcf.ops.knn import bin_points_dense, knn_select_dense


class TestKnnKernel:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_jnp_twin(self, seed):
        from dcf.ops.pallas.knn_kernel import knn_select_pallas
        rng = np.random.default_rng(seed)
        H, W, cap, K = 16, 128, 4, 3
        pts = np.zeros((300, 4), np.float32)
        pts[:, 0] = rng.uniform(0, H, 300)
        pts[:, 1] = rng.uniform(0, W, 300)
        pts[:, 2] = rng.uniform(-2, 2, 300)
        pts[:, 3] = np.arange(300)
        mask = rng.uniform(size=300) < 0.9
        bins = bin_points_dense(jnp.asarray(pts), jnp.asarray(mask),
                                (0.0, 0.0), 1.0, (H, W), cap)
        ref_nbr, ref_valid, ref_d2 = knn_select_dense(
            bins, (0.0, 0.0), 1.0, K, 1)
        got_nbr, got_valid, got_d2 = knn_select_pallas(
            bins, (0.0, 0.0), 1.0, K, 1, tile_rows=8, interpret=True)

        np.testing.assert_array_equal(np.asarray(got_valid),
                                      np.asarray(ref_valid))
        np.testing.assert_allclose(np.asarray(got_d2),
                                   np.asarray(ref_d2), rtol=1e-6)
        ref_nbr = np.asarray(ref_nbr)
        got_nbr = np.asarray(got_nbr)
        v = np.asarray(ref_valid)
        np.testing.assert_allclose(got_nbr[v], ref_nbr[v], rtol=1e-6)

    def test_empty_bins(self):
        from dcf.ops.pallas.knn_kernel import knn_select_pallas
        bins = bin_points_dense(jnp.zeros((16, 4)), jnp.zeros(16, bool),
                                (0.0, 0.0), 1.0, (8, 128), 4)
        nbr, valid, d2 = knn_select_pallas(bins, (0.0, 0.0), 1.0, 2, 1,
                                           tile_rows=8, interpret=True)
        assert not np.asarray(valid).any()
        assert np.isinf(np.asarray(d2)).all()


class TestVoxelizeKernel:
    def _mk(self, rng, P=2048):
        from dcf.config import VoxelConfig
        cfg = VoxelConfig(x_min=0, x_max=12.8, y_min=-6.4, y_max=6.4,
                          z_min=-2, z_max=2, voxel_size=0.1,
                          z_slice_size=0.2, max_points=P)
        pts = np.zeros((P, 4), np.float32)
        pts[:, 0] = rng.uniform(-1, 14, P)
        pts[:, 1] = rng.uniform(-7, 7, P)
        pts[:, 2] = rng.uniform(-2.5, 2.5, P)
        pts[:, 3] = rng.uniform(0, 1, P)
        mask = rng.uniform(size=P) < 0.9
        return cfg, jnp.asarray(pts), jnp.asarray(mask)

    def test_matches_jnp_twin(self, rng):
        from dcf.data.voxelize import rasterize_bev
        from dcf.ops.pallas.voxelize_kernel import rasterize_bev_pallas
        cfg, pts, mask = self._mk(rng)
        ref = np.asarray(rasterize_bev(pts, mask, cfg))
        got = np.asarray(rasterize_bev_pallas(pts, mask, cfg, slab_rows=8,
                                              cap=512, interpret=True))
        nz = cfg.num_z_slices
        # occupancy channels are exact; the intensity mean accumulates in
        # the matmul with bf16-grade rounding
        np.testing.assert_array_equal(got[..., :nz], ref[..., :nz])
        np.testing.assert_allclose(got[..., nz], ref[..., nz], atol=5e-3)

    def test_empty(self):
        from dcf.config import VoxelConfig
        from dcf.ops.pallas.voxelize_kernel import rasterize_bev_pallas
        cfg = VoxelConfig(x_min=0, x_max=6.4, y_min=-3.2, y_max=3.2,
                          z_min=-2, z_max=2, voxel_size=0.1,
                          z_slice_size=0.2, max_points=128)
        out = rasterize_bev_pallas(jnp.zeros((128, 4)),
                                   jnp.zeros(128, bool), cfg,
                                   slab_rows=8, cap=128, interpret=True)
        assert not np.asarray(out).any()
