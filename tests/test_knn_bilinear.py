"""Grid-hash KNN + bilinear sampling tests (SURVEY.md 4.2/4.3)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dcf.ops.knn import (bin_points, bin_points_dense, knn_query_grid,
                         knn_select_dense)
from dcf.ops.bilinear import bilinear_sample


class TestBinPoints:
    def test_basic_binning(self):
        pts = jnp.asarray(np.array(
            [[0.5, 0.5], [0.6, 0.4], [2.5, 2.5], [9.0, 9.0]], np.float32))
        mask = jnp.asarray([True, True, True, False])
        table = bin_points(pts, mask, (0.0, 0.0), 1.0, (4, 4), capacity=4)
        t = np.asarray(table.valid).reshape(4, 4, 4)
        # cell (0,0) has 2 points; cell (2,2) has 1; masked point dropped
        assert t[0, 0].sum() == 2
        assert t[2, 2].sum() == 1
        assert t.sum() == 3

    def test_capacity_overflow_drops(self, rng):
        pts = jnp.asarray(
            rng.uniform(0.1, 0.9, (10, 2)).astype(np.float32))
        mask = jnp.ones(10, bool)
        table = bin_points(pts, mask, (0.0, 0.0), 1.0, (2, 2), capacity=4)
        assert np.asarray(table.valid).sum() == 4  # capped

    def test_indices_point_back(self, rng):
        pts = rng.uniform(0, 4, (50, 2)).astype(np.float32)
        mask = np.ones(50, bool)
        table = bin_points(jnp.asarray(pts), jnp.asarray(mask),
                           (0.0, 0.0), 1.0, (4, 4), capacity=8)
        idx = np.asarray(table.indices)
        val = np.asarray(table.valid)
        for cell in range(16):
            ci, cj = divmod(cell, 4)
            for s in range(8):
                if val[cell, s]:
                    p = pts[idx[cell, s]]
                    assert int(p[0]) == ci and int(p[1]) == cj


class TestKnnQuery:
    def test_matches_bruteforce_within_window(self, rng):
        H = W = 8
        cell = 1.0
        pts = rng.uniform(0, 8, (200, 2)).astype(np.float32)
        mask = rng.uniform(size=200) < 0.9
        K = 4
        cap = 16  # high capacity so binning loses nothing
        table = bin_points(jnp.asarray(pts), jnp.asarray(mask),
                           (0.0, 0.0), cell, (H, W), cap)
        idx, valid, d2 = knn_query_grid(table, jnp.asarray(pts),
                                        (0.0, 0.0), cell, K, 1)
        idx, valid, d2 = map(np.asarray, (idx, valid, d2))

        for pix in range(H * W):
            i, j = divmod(pix, W)
            cx, cy = i + 0.5, j + 0.5
            # brute force within the 3x3 cell window
            cand = []
            for pi, p in enumerate(pts):
                if not mask[pi]:
                    continue
                if abs(int(p[0]) - i) <= 1 and abs(int(p[1]) - j) <= 1:
                    cand.append((np.sum((p - [cx, cy]) ** 2), pi))
            cand.sort()
            want = [c[0] for c in cand[:K]]
            got = sorted(d2[pix][valid[pix]])
            assert len(got) == min(len(want), K)
            np.testing.assert_allclose(got, want[:len(got)], rtol=1e-5)

    def test_empty_grid(self):
        pts = jnp.zeros((16, 2), jnp.float32)
        mask = jnp.zeros((16,), bool)
        table = bin_points(pts, mask, (0.0, 0.0), 1.0, (4, 4), 4)
        idx, valid, d2 = knn_query_grid(table, pts, (0.0, 0.0), 1.0, 2, 1)
        assert not np.asarray(valid).any()

    def test_dense_matches_index_form(self, rng):
        """Production (payload/shift) path == reference (index/gather) path
        (SURVEY.md 4.3 twin-parity)."""
        H = W = 8
        pts = rng.uniform(0, 8, (150, 4)).astype(np.float32)
        mask = rng.uniform(size=150) < 0.9
        K, cap = 4, 16
        table = bin_points(jnp.asarray(pts[:, :2]), jnp.asarray(mask),
                           (0.0, 0.0), 1.0, (H, W), cap)
        idx_i, val_i, d2_i = knn_query_grid(table, jnp.asarray(pts[:, :2]),
                                            (0.0, 0.0), 1.0, K, 1)
        bins = bin_points_dense(jnp.asarray(pts), jnp.asarray(mask),
                                (0.0, 0.0), 1.0, (H, W), cap)
        nbr_d, val_d, d2_d = knn_select_dense(bins, (0.0, 0.0), 1.0, K, 1)
        val_i, val_d = np.asarray(val_i), np.asarray(val_d).reshape(-1, K)
        d2_i, d2_d = np.asarray(d2_i), np.asarray(d2_d).reshape(-1, K)
        nbr_d = np.asarray(nbr_d).reshape(-1, K, 4)
        np.testing.assert_array_equal(val_i, val_d)
        np.testing.assert_allclose(np.where(val_i, d2_i, 0),
                                   np.where(val_d, d2_d, 0), rtol=1e-5)
        # payloads must be the actual selected points
        idx_i = np.asarray(idx_i)
        for pix in range(H * W):
            for s in range(K):
                if val_i[pix, s]:
                    np.testing.assert_allclose(nbr_d[pix, s],
                                               pts[idx_i[pix, s]],
                                               rtol=1e-6)


class TestBilinear:
    def test_exact_at_integer_coords(self, rng):
        feat = rng.uniform(0, 1, (6, 8, 3)).astype(np.float32)
        uv = np.array([[2.0, 3.0], [0.0, 0.0], [7.0, 5.0]], np.float32)
        out, inside = bilinear_sample(jnp.asarray(feat), jnp.asarray(uv))
        out = np.asarray(out)
        np.testing.assert_allclose(out[0], feat[3, 2], rtol=1e-6)
        np.testing.assert_allclose(out[1], feat[0, 0], rtol=1e-6)
        np.testing.assert_allclose(out[2], feat[5, 7], rtol=1e-6)
        assert np.asarray(inside).all()

    def test_outside_is_zero(self):
        feat = jnp.ones((4, 4, 2))
        uv = jnp.asarray([[-0.5, 1.0], [1.0, 4.2], [2.9, 2.9]])
        out, inside = bilinear_sample(feat, uv)
        assert not bool(inside[0]) and not bool(inside[1])
        assert bool(inside[2])
        np.testing.assert_allclose(np.asarray(out[0]), 0.0)
        np.testing.assert_allclose(np.asarray(out[1]), 0.0)

    def test_against_torch_grid_sample(self, rng):
        H, W, C = 10, 14, 5
        feat = rng.uniform(-1, 1, (H, W, C)).astype(np.float32)
        uv = np.stack([rng.uniform(0, W - 1, 64),
                       rng.uniform(0, H - 1, 64)], -1).astype(np.float32)
        got, _ = bilinear_sample(jnp.asarray(feat), jnp.asarray(uv))

        t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]   # [1,C,H,W]
        # normalize to [-1, 1] with align_corners=True convention
        gx = uv[:, 0] / (W - 1) * 2 - 1
        gy = uv[:, 1] / (H - 1) * 2 - 1
        grid = torch.from_numpy(np.stack([gx, gy], -1))[None, :, None]
        want = F.grid_sample(t_feat, grid, mode="bilinear",
                             align_corners=True)[0, :, :, 0].T.numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
