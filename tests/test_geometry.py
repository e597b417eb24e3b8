"""Geometry cross-checks (SURVEY.md 4.2): jnp vs numpy vs cv2 oracle."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from dcf.geometry import boxes as jb
from dcf.geometry import np_boxes as nb
from dcf.geometry.transforms import Calibration, project_velo_to_image


def _random_bev_boxes(rng, n, scale=10.0):
    out = np.zeros((n, 5))
    out[:, 0:2] = rng.uniform(-scale, scale, (n, 2))
    out[:, 2:4] = rng.uniform(0.5, 6.0, (n, 2))
    out[:, 4] = rng.uniform(-np.pi, np.pi, n)
    return out


def _cv2_intersection(a, b):
    ra = ((a[0], a[1]), (a[2], a[3]), np.degrees(a[4]))
    rb = ((b[0], b[1]), (b[2], b[3]), np.degrees(b[4]))
    ret, pts = cv2.rotatedRectangleIntersection(ra, rb)
    if pts is None or len(pts) < 3:
        return 0.0
    return cv2.contourArea(cv2.convexHull(pts))


class TestRotatedIoU:
    def test_identical_boxes(self):
        box = jnp.array([[1.0, 2.0, 4.0, 2.0, 0.3]])
        iou = jb.rotated_iou_bev(box, box)
        np.testing.assert_allclose(np.asarray(iou), [[1.0]], atol=1e-5)

    def test_disjoint(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[10.0, 0.0, 2.0, 2.0, 1.0]])
        np.testing.assert_allclose(np.asarray(jb.rotated_iou_bev(a, b)),
                                   [[0.0]], atol=1e-7)

    def test_axis_aligned_overlap(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        # inter = 1x2 = 2, union = 4 + 4 - 2 = 6
        np.testing.assert_allclose(np.asarray(jb.rotated_iou_bev(a, b)),
                                   [[2.0 / 6.0]], atol=1e-5)

    def test_rotated_45(self):
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
        # square vs same square rotated 45 deg: octagon inter = 8(sqrt2 - 1)
        inter = 8 * (np.sqrt(2) - 1)
        expect = inter / (8 - inter)
        np.testing.assert_allclose(np.asarray(jb.rotated_iou_bev(a, b)),
                                   [[expect]], atol=1e-5)

    def test_jnp_matches_numpy_matches_cv2(self, rng):
        a = _random_bev_boxes(rng, 24)
        b = _random_bev_boxes(rng, 16)
        got_j = np.asarray(jb.rotated_iou_bev(jnp.asarray(a), jnp.asarray(b)))
        got_n = nb.rotated_iou_bev(a, b)
        np.testing.assert_allclose(got_j, got_n, atol=2e-4)
        for i in range(0, 24, 5):
            for j in range(0, 16, 5):
                inter = _cv2_intersection(a[i], b[j])
                union = a[i, 2] * a[i, 3] + b[j, 2] * b[j, 3] - inter
                np.testing.assert_allclose(got_n[i, j], inter / union,
                                           atol=2e-3)

    def test_containment(self):
        a = jnp.array([[0.0, 0.0, 10.0, 10.0, 0.2]])
        b = jnp.array([[0.0, 0.0, 1.0, 1.0, 1.0]])
        np.testing.assert_allclose(np.asarray(jb.rotated_iou_bev(a, b)),
                                   [[1.0 / 100.0]], atol=1e-5)


class TestIoU3D:
    def test_matches_numpy(self, rng):
        def rand7(n):
            out = np.zeros((n, 7))
            out[:, 0:2] = rng.uniform(-5, 5, (n, 2))
            out[:, 2] = rng.uniform(-2, 2, n)
            out[:, 3:6] = rng.uniform(0.5, 4.0, (n, 3))
            out[:, 6] = rng.uniform(-np.pi, np.pi, n)
            return out
        a, b = rand7(12), rand7(9)
        got_j = np.asarray(jb.iou_3d(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got_j, nb.iou_3d(a, b), atol=2e-4)

    def test_identical(self):
        box = jnp.array([[1.0, 2.0, -1.0, 4.0, 2.0, 1.5, 0.7]])
        np.testing.assert_allclose(np.asarray(jb.iou_3d(box, box)), [[1.0]],
                                   atol=1e-5)


class TestEncodeDecode:
    def test_roundtrip(self, rng):
        anchors = np.zeros((50, 7))
        anchors[:, 0:2] = rng.uniform(-30, 30, (50, 2))
        anchors[:, 2] = -1.0
        anchors[:, 3:6] = np.array([3.9, 1.6, 1.56])
        anchors[:, 6] = rng.choice([0.0, np.pi / 2], 50)
        gt = anchors.copy()
        gt[:, 0:3] += rng.uniform(-2, 2, (50, 3))
        gt[:, 3:6] *= rng.uniform(0.8, 1.2, (50, 3))
        gt[:, 6] += rng.uniform(-0.5, 0.5, 50)
        enc = jb.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
        dec = jb.decode_boxes(enc, jnp.asarray(anchors))
        np.testing.assert_allclose(np.asarray(dec), gt, atol=5e-4)
        # channel-major twin (the train-path layout) is bitwise the
        # same math on transposed inputs
        enc_cm = jb.encode_boxes_cm(jnp.asarray(gt.T),
                                    jnp.asarray(anchors.T))
        np.testing.assert_array_equal(np.asarray(enc_cm).T,
                                      np.asarray(enc))

    def test_zero_delta_is_anchor(self):
        anchors = jnp.array([[5.0, -3.0, -1.0, 3.9, 1.6, 1.56, 0.0]])
        dec = jb.decode_boxes(jnp.zeros((1, 7)), anchors)
        np.testing.assert_allclose(np.asarray(dec), np.asarray(anchors),
                                   atol=1e-6)


class TestCorners:
    def test_bev_corners_axis_aligned(self):
        c = np.asarray(jb.box_corners_bev(jnp.array([[0.0, 0.0, 4.0, 2.0,
                                                      0.0]])))[0]
        expect = {(2.0, 1.0), (-2.0, 1.0), (-2.0, -1.0), (2.0, -1.0)}
        got = {(round(float(p[0]), 5), round(float(p[1]), 5)) for p in c}
        assert got == expect

    def test_corners_ccw(self, rng):
        b = _random_bev_boxes(rng, 10)
        corners = np.asarray(jb.box_corners_bev(jnp.asarray(b)))
        for poly in corners:
            area2 = 0.0
            for k in range(4):
                p, q = poly[k], poly[(k + 1) % 4]
                area2 += p[0] * q[1] - p[1] * q[0]
            assert area2 > 0  # CCW

    def test_3d_corners_extents(self):
        c = np.asarray(jb.boxes3d_corners(
            jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 0.0]])))[0]
        assert c.shape == (8, 3)
        np.testing.assert_allclose(c[:, 2].min(), 2.5)
        np.testing.assert_allclose(c[:, 2].max(), 3.5)
        np.testing.assert_allclose(c[:, 0].min(), -1.0)
        np.testing.assert_allclose(c[:, 0].max(), 3.0)


class TestPointsInBoxes:
    def test_jnp_matches_numpy(self, rng):
        pts = rng.uniform(-10, 10, (200, 3))
        boxes = _random_bev_boxes(rng, 8, scale=8.0)
        got_j = np.asarray(jb.points_in_bev_boxes(jnp.asarray(pts),
                                                  jnp.asarray(boxes)))
        got_n = nb.points_in_bev_boxes(pts, boxes)
        np.testing.assert_array_equal(got_j, got_n)

    def test_rotation_respected(self):
        # long thin box rotated 90 deg: point at (0, 1.5) inside only then
        pts = np.array([[0.0, 1.5, 0.0]])
        box0 = np.array([[0.0, 0.0, 4.0, 1.0, 0.0]])
        box90 = np.array([[0.0, 0.0, 4.0, 1.0, np.pi / 2]])
        assert not nb.points_in_bev_boxes(pts, box0)[0, 0]
        assert nb.points_in_bev_boxes(pts, box90)[0, 0]


class TestCalibration:
    def test_velo_rect_roundtrip(self, rng):
        calib = Calibration.identity()
        pts = rng.uniform(-20, 20, (100, 3))
        back = calib.rect_to_velo(calib.velo_to_rect(pts))
        np.testing.assert_allclose(back, pts, atol=1e-9)

    def test_identity_projection_geometry(self):
        calib = Calibration.identity(fu=100.0, fv=100.0, cu=50.0, cv=50.0)
        # point 10 m ahead on the optical axis -> principal point
        uvz = calib.velo_to_image(np.array([[10.0, 0.0, 0.0]]))
        np.testing.assert_allclose(uvz[0], [50.0, 50.0, 10.0], atol=1e-9)
        # 1 m to the left (+y velo) at 10 m -> O.1 * fu px left of center
        uvz = calib.velo_to_image(np.array([[10.0, 1.0, 0.0]]))
        np.testing.assert_allclose(uvz[0], [40.0, 50.0, 10.0], atol=1e-9)

    def test_jnp_projection_matches_numpy(self, rng):
        calib = Calibration.identity()
        pts = rng.uniform(1, 30, (64, 3)) * np.array([1, 0.3, 0.1])
        want = calib.velo_to_image(pts)
        got = np.asarray(project_velo_to_image(
            jnp.asarray(pts, jnp.float32),
            jnp.asarray(calib.velo_to_image_matrix)))
        # fp32 vs fp64: near-camera points amplify rounding into pixels
        np.testing.assert_allclose(got, want, rtol=5e-3, atol=0.05)

    def test_flip_consistency(self, rng):
        W = 1242
        calib = Calibration.identity()
        pts = rng.uniform(1, 30, (64, 3)) * np.array([1, 0.3, 0.1])
        orig = calib.velo_to_image(pts)
        flipped_pts = pts * np.array([1, -1, 1])
        flipped = calib.flip_horizontal(W).velo_to_image(flipped_pts)
        np.testing.assert_allclose(flipped[:, 0], (W - 1) - orig[:, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(flipped[:, 1], orig[:, 1], atol=1e-6)

    def test_parse_kitti_file(self, tmp_path):
        txt = (
            "P2: 7.215377e+02 0 6.095593e+02 4.485728e+01 "
            "0 7.215377e+02 1.728540e+02 2.163791e-01 0 0 1 2.745884e-03\n"
            "R0_rect: 0.9999 0.0098 -0.0074 -0.0098 0.9999 -0.0043 "
            "0.0074 0.0043 0.9999\n"
            "Tr_velo_to_cam: 0.0075 -0.9999 -0.0006 -0.0040 0.0148 0.0007 "
            "-0.9998 -0.0766 0.9998 0.0075 0.0148 -0.2717\n")
        p = tmp_path / "000000.txt"
        p.write_text(txt)
        calib = Calibration.from_kitti_calib_file(str(p))
        # a lidar point in front of the car must land inside the image
        uvz = calib.velo_to_image(np.array([[15.0, 0.0, -1.0]]))
        assert 0 < uvz[0, 0] < 1242 and 0 < uvz[0, 1] < 375
        assert uvz[0, 2] > 10
