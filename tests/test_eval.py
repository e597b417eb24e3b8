"""KITTI AP evaluator tests (SURVEY.md T5)."""

import numpy as np

from dcf.eval.kitti_eval import (FrameDetections, FrameGroundTruth, evaluate)


def _box(x, y, yaw=0.0, cls=0):
    return np.array([x, y, -1.0, 3.9, 1.6, 1.56, yaw], np.float32)


def _gt(boxes, classes, difficulty=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 7)
    classes = np.asarray(classes, np.int32)
    if difficulty is None:
        difficulty = np.zeros(len(boxes), np.int32)
    return FrameGroundTruth(boxes7=boxes, classes=classes,
                            difficulty=np.asarray(difficulty, np.int32))


def _det(boxes, classes, scores):
    return FrameDetections(
        boxes7=np.asarray(boxes, np.float32).reshape(-1, 7),
        scores=np.asarray(scores, np.float32),
        classes=np.asarray(classes, np.int32))


class TestAP:
    def test_perfect_detections(self):
        gt = [_gt([_box(10, 0), _box(20, 5)], [0, 0])]
        det = [_det([_box(10, 0), _box(20, 5)], [0, 0], [0.9, 0.8])]
        r = evaluate(gt, det, metric="3d")
        assert r["Car_3d_easy"] > 0.99
        assert r["Car_3d_moderate"] > 0.99

    def test_no_detections(self):
        gt = [_gt([_box(10, 0)], [0])]
        det = [_det(np.zeros((0, 7)), [], [])]
        r = evaluate(gt, det, metric="3d")
        assert r["Car_3d_moderate"] == 0.0

    def test_false_positives_lower_ap(self):
        gt = [_gt([_box(10, 0)], [0])]
        clean = [_det([_box(10, 0)], [0], [0.9])]
        # false positives with HIGHER score than the true positive
        noisy = [_det([_box(10, 0), _box(50, 20), _box(60, -20)],
                      [0, 0, 0], [0.5, 0.95, 0.94])]
        r_clean = evaluate(gt, clean, metric="3d")
        r_noisy = evaluate(gt, noisy, metric="3d")
        assert r_noisy["Car_3d_moderate"] < r_clean["Car_3d_moderate"]

    def test_localization_threshold(self):
        gt = [_gt([_box(10, 0)], [0])]
        # shifted by 2m: BEV IoU well below 0.7 -> no credit for Car
        det = [_det([_box(12, 0)], [0], [0.9])]
        r = evaluate(gt, det, metric="3d")
        assert r["Car_3d_moderate"] == 0.0

    def test_class_confusion(self):
        gt = [_gt([_box(10, 0)], [0])]
        det = [_det([_box(10, 0)], [1], [0.9])]   # right box, wrong class
        r = evaluate(gt, det, metric="3d")
        assert r["Car_3d_moderate"] == 0.0

    def test_difficulty_ignore_semantics(self):
        # hard gt is ignored at easy level: matching it costs nothing,
        # and it does not count as a missed gt
        gt = [_gt([_box(10, 0), _box(30, 5)], [0, 0], difficulty=[0, 2])]
        det = [_det([_box(10, 0), _box(30, 5)], [0, 0], [0.9, 0.8])]
        r = evaluate(gt, det, metric="3d")
        assert r["Car_3d_easy"] > 0.99
        assert r["Car_3d_hard"] > 0.99

    def test_bev_more_forgiving_than_3d(self):
        gt = [_gt([_box(10, 0)], [0])]
        # correct BEV pose but wrong height center
        b = _box(10, 0)
        b[2] += 0.8
        det = [_det([b], [0], [0.9])]
        r3d = evaluate(gt, det, metric="3d")
        rbev = evaluate(gt, det, metric="bev")
        assert rbev["Car_bev_moderate"] >= r3d["Car_3d_moderate"]

    def test_multiframe_pooling(self):
        gt = [_gt([_box(10, 0)], [0]), _gt([_box(15, 2)], [0])]
        det = [_det([_box(10, 0)], [0], [0.9]),
               _det(np.zeros((0, 7)), [], [])]
        r = evaluate(gt, det, metric="3d")
        # one of two gts found -> AP around 0.5, definitely between 0.3/0.7
        assert 0.3 < r["Car_3d_moderate"] < 0.7
