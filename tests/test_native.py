"""Native C++ host core vs numpy twins (SURVEY.md 2.4)."""

import numpy as np
import pytest

from dcf import native
from dcf.geometry import np_boxes


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


class TestNative:
    def test_read_velodyne(self, tmp_path, rng):
        pts = rng.uniform(-10, 10, (1000, 4)).astype(np.float32)
        p = tmp_path / "000000.bin"
        pts.tofile(str(p))
        got = native.read_velodyne(str(p))
        np.testing.assert_array_equal(got, pts)

    def test_crop_pad_matches_numpy(self, rng):
        from dcf.config import VoxelConfig
        from dcf.data.voxelize import crop_and_pad
        cfg = VoxelConfig(x_min=0, x_max=10, y_min=-5, y_max=5, z_min=-2,
                          z_max=2, voxel_size=0.5, max_points=512)
        pts = rng.uniform(-8, 12, (400, 4)).astype(np.float32)
        out_n, mask_n = crop_and_pad(pts, cfg)       # native fast path
        res = native.crop_pad(pts, (0, 10, -5, 5, -2, 2), 512)
        assert res is not None
        out_c, mask_c = res
        np.testing.assert_array_equal(out_n, out_c)
        np.testing.assert_array_equal(mask_n, mask_c)

    def test_rotated_iou_matches_numpy(self, rng):
        a = np.concatenate([rng.uniform(-10, 10, (20, 2)),
                            rng.uniform(1, 5, (20, 2)),
                            rng.uniform(-3, 3, (20, 1))], axis=1)
        b = np.concatenate([rng.uniform(-10, 10, (15, 2)),
                            rng.uniform(1, 5, (15, 2)),
                            rng.uniform(-3, 3, (15, 1))], axis=1)
        np.testing.assert_allclose(native.rotated_iou_bev(a, b),
                                   np_boxes.rotated_iou_bev(a, b),
                                   atol=1e-9)

    def test_iou_3d_matches_numpy(self, rng):
        def rand7(n):
            out = np.zeros((n, 7))
            out[:, 0:2] = rng.uniform(-5, 5, (n, 2))
            out[:, 2] = rng.uniform(-2, 2, n)
            out[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
            out[:, 6] = rng.uniform(-np.pi, np.pi, n)
            return out
        a, b = rand7(15), rand7(12)
        np.testing.assert_allclose(native.iou_3d(a, b),
                                   np_boxes.iou_3d(a, b), atol=1e-9)
