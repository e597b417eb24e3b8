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

    def test_sort_points_fine_matches_argsort(self, rng):
        """Counting sort == the numpy stable-argsort twin, bitwise
        (preprocess.sort_points_host's fallback)."""
        from dcf.config import multi_scale_config
        from dcf.data import preprocess as pp
        from dcf.data.synthetic import make_varied_frame
        cfg = multi_scale_config()
        vox = cfg.voxel
        fine = min(cfg.backbone.fusion_strides)
        for seed in (0, 5):
            f = make_varied_frame(seed=seed)
            pts, mask = pp.crop_and_pad(f.points, vox, seed=0)
            got = native.sort_points_fine(
                pts, mask, vox.x_min, vox.y_min, vox.voxel_size, fine,
                vox.grid_x, vox.grid_y)
            assert got is not None
            Hf, Wf = vox.grid_x // fine, vox.grid_y // fine
            cell = np.float32(vox.voxel_size * fine)
            ix = np.floor((pts[:, 0] - np.float32(vox.x_min))
                          / cell).astype(np.int32)
            iy = np.floor((pts[:, 1] - np.float32(vox.y_min))
                          / cell).astype(np.int32)
            inb = mask & (ix >= 0) & (ix < Hf) & (iy >= 0) & (iy < Wf)
            key = np.where(inb, ix * Wf + iy, Hf * Wf)
            order = np.argsort(key, kind="stable")
            np.testing.assert_array_equal(got[0], pts[order])
            np.testing.assert_array_equal(got[1], mask[order])

    def test_fusion_host_arrays_native_matches_numpy(self, monkeypatch):
        """The native ranks/row-cum/uv-divide path of
        fusion_host_arrays == the pure-numpy fallback, bitwise."""
        from dcf.config import multi_scale_config
        from dcf.data import preprocess as pp
        from dcf.data.synthetic import make_varied_frame
        cfg = multi_scale_config()
        for seed in (1, 6):
            f = make_varied_frame(seed=seed)
            pts, mask = pp.crop_and_pad(f.points, cfg.voxel, seed=0)
            pts, mask = pp.sort_points_host(pts, mask, cfg)
            v2i = f.calib.velo_to_image_matrix.astype(np.float32)
            got = pp.fusion_host_arrays(pts, mask, v2i, cfg)
            with monkeypatch.context() as mp:
                mp.setattr(native, "fusion_ranks",
                           lambda *a, **k: None)
                mp.setattr(native, "uvw_to_uvz", lambda *a, **k: None)
                ref = pp.fusion_host_arrays(pts, mask, v2i, cfg)
            assert set(got) == set(ref)
            for k in ref:
                np.testing.assert_array_equal(got[k], ref[k], err_msg=k)

    def test_image_s2d_native_matches_numpy(self):
        """Fused u8 letterbox+s2d == prepare_image + s2d_image, bitwise
        (the /255 rides an exact-IEEE-divide table)."""
        from dcf.config import multi_scale_config
        from dcf.data import preprocess as pp
        from dcf.data.synthetic import make_varied_frame
        cfg = multi_scale_config()
        for seed in (2, 7):
            f = make_varied_frame(seed=seed)
            assert f.image.dtype == np.uint8
            got, sc1 = pp.prepare_image_s2d(f.image, cfg)
            full, sc2 = pp.prepare_image(f.image, cfg)
            assert sc1 == sc2
            np.testing.assert_array_equal(got, pp.s2d_image(full))

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
