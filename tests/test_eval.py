"""KITTI AP evaluator tests (SURVEY.md T5): devkit-faithful semantics.

The evaluator reimplements the official KITTI devkit protocol
(evaluate_object_3d_offline.cpp / kitti-object-eval-python). The fixtures
below hand-compute APs under that protocol, including its small-sample
quirks (the 41-point recall grid quantizes AP to ~k/41 on tiny splits),
DontCare regions, similar-class (Van/Person_sitting) ignores, and the
min-2D-height detection filter.
"""

import numpy as np
import pytest

from dcf.eval.kitti_eval import (
    Annotation, FrameDetections, FrameGroundTruth, evaluate,
    evaluate_annotations, get_thresholds, image_box_overlap,
    _frame_statistics)


def _box(x, y, yaw=0.0):
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


def _anno(names, boxes, scores=None, heights=None, occluded=None,
          truncated=None, alphas=None):
    n = len(names)
    boxes = (np.asarray(boxes, np.float64).reshape(-1, 7) if n
             else np.zeros((0, 7)))
    heights = np.full(n, 60.0) if heights is None else np.asarray(heights,
                                                                  float)
    bbox2d = np.zeros((n, 4))
    bbox2d[:, 2] = 50.0
    bbox2d[:, 3] = heights
    return Annotation(
        names=list(names), boxes7=boxes, bbox2d=bbox2d,
        truncated=(np.zeros(n) if truncated is None
                   else np.asarray(truncated, float)),
        occluded=(np.zeros(n) if occluded is None
                  else np.asarray(occluded, float)),
        alpha=None if alphas is None else np.asarray(alphas, float),
        scores=None if scores is None else np.asarray(scores, float))


class TestDevkitQuirks:
    """Exact hand-computed values under the official protocol."""

    def test_two_perfect_dets_r40_is_one_fortieth(self):
        # 2 gts, 2 perfect dets -> thresholds [0.9, 0.8] fill exactly 2 of
        # the 41 recall samples; R40 averages samples 1..40 -> 1/40.
        gt = [_gt([_box(10, 0), _box(20, 5)], [0, 0])]
        det = [_det([_box(10, 0), _box(20, 5)], [0, 0], [0.9, 0.8])]
        r40 = evaluate(gt, det, metric="3d", num_points=40)
        r11 = evaluate(gt, det, metric="3d", num_points=11)
        exact = evaluate(gt, det, metric="3d", num_points=0)
        assert r40["Car_3d_easy"] == pytest.approx(1.0 / 40.0)
        assert r11["Car_3d_easy"] == pytest.approx(1.0 / 11.0)
        assert exact["Car_3d_easy"] == pytest.approx(1.0)

    def test_many_perfect_dets_r40_is_one(self):
        # 50 gts with dense distinct scores fill the whole recall grid.
        rng = np.random.default_rng(0)
        gts, dets = [], []
        for f in range(5):
            boxes = [_box(8 + 6 * i, -20 + 9 * f) for i in range(10)]
            gts.append(_gt(boxes, [0] * 10))
            dets.append(_det(boxes, [0] * 10,
                             rng.uniform(0.2, 0.99, 10)))
        r = evaluate(gts, dets, metric="3d", num_points=40)
        assert r["Car_3d_moderate"] == pytest.approx(1.0)

    def test_fp_halves_precision_exact(self):
        # 1 gt matched at score .5 plus a far fp at .9 counted at the
        # single threshold -> precision 1/2, recall 1 -> exact AP 0.5.
        gt = [_gt([_box(10, 0)], [0])]
        det = [_det([_box(10, 0), _box(50, 20)], [0, 0], [0.5, 0.9])]
        r = evaluate(gt, det, metric="3d", num_points=0)
        assert r["Car_3d_moderate"] == pytest.approx(0.5)

    def test_get_thresholds_sampling(self):
        # devkit getThresholds: recall samples every 1/40; with 4 gts and
        # 4 tp scores each append advances the sample 0.025 while recall
        # advances 0.25, so every score is kept.
        t = get_thresholds(np.array([0.9, 0.8, 0.7, 0.6]), num_gt=4)
        assert list(t) == [0.9, 0.8, 0.7, 0.6]
        # 200 gts, 100 tps: recall step 0.005 < sample step 0.025 -> only
        # every ~5th score is kept, and the last is always kept.
        scores = np.linspace(0.99, 0.01, 100)
        t = get_thresholds(scores, num_gt=200)
        assert len(t) == 21  # recall reaches 0.5 -> ~20 samples + last
        assert t[-1] == pytest.approx(scores[-1])


class TestDevkitSemantics:
    def test_dontcare_region_absorbs_fp(self):
        # det B (score .95) sits inside a DontCare 2D region: at the
        # threshold from det A's tp score (.9) it is NOT an fp.
        gt_names = ["Car", "DontCare"]
        gt = _anno(gt_names, [_box(10, 0), np.zeros(7)])
        gt.bbox2d[1] = [200.0, 0.0, 300.0, 60.0]      # DontCare region
        det = _anno(["Car", "Car"], [_box(10, 0), _box(50, 20)],
                    scores=[0.9, 0.95])
        det.bbox2d[1] = [210.0, 5.0, 290.0, 55.0]     # inside the region
        r = evaluate_annotations([gt], [det], metrics=("bbox",),
                                 num_points=0)
        assert r["Car_bbox_moderate"] == pytest.approx(1.0)
        # control: without the DontCare row the same det is an fp
        gt2 = _anno(["Car"], [_box(10, 0)])
        gt2.bbox2d[0] = gt.bbox2d[0]
        det2 = _anno(["Car", "Car"], [_box(10, 0), _box(50, 20)],
                     scores=[0.9, 0.95])
        det2.bbox2d[0] = gt.bbox2d[0]
        det2.bbox2d[1] = [210.0, 5.0, 290.0, 55.0]
        r2 = evaluate_annotations([gt2], [det2], metrics=("bbox",),
                                  num_points=0)
        assert r2["Car_bbox_moderate"] == pytest.approx(0.5)

    def test_van_is_ignored_for_car(self):
        # A det matching a Van gt is neither tp nor fp for Car.
        gt = _anno(["Car", "Van"], [_box(10, 0), _box(30, 5)])
        det = _anno(["Car", "Car"], [_box(10, 0), _box(30, 5)],
                    scores=[0.9, 0.95])
        r = evaluate_annotations([gt], [det], metrics=("3d",), num_points=0)
        assert r["Car_3d_moderate"] == pytest.approx(1.0)
        # control: the second gt as a Truck (irrelevant class) -> its det
        # becomes a plain fp
        gt2 = _anno(["Car", "Truck"], [_box(10, 0), _box(30, 5)])
        r2 = evaluate_annotations([gt2], [det], metrics=("3d",),
                                  num_points=0)
        assert r2["Car_3d_moderate"] == pytest.approx(0.5)

    def test_min_height_det_filter(self):
        # A detection whose 2D box is under 25 px is ignored: neither tp
        # (its gt is silently absorbed) nor fp.
        gt = _anno(["Car", "Car"], [_box(10, 0), _box(40, 5)])
        det = _anno(["Car", "Car"], [_box(10, 0), _box(40, 5)],
                    scores=[0.9, 0.8], heights=[60.0, 20.0])
        r = evaluate_annotations([gt], [det], metrics=("3d",), num_points=0)
        assert r["Car_3d_moderate"] == pytest.approx(0.5)

    def test_occlusion_truncation_difficulty(self):
        # occluded=2 gt: ignored at easy/moderate, counted at hard.
        gt = _anno(["Car", "Car"], [_box(10, 0), _box(40, 5)],
                   occluded=[0, 2])
        det = _anno(["Car"], [_box(10, 0)], scores=[0.9])
        r = evaluate_annotations([gt], [det], metrics=("3d",), num_points=0)
        assert r["Car_3d_easy"] == pytest.approx(1.0)
        assert r["Car_3d_moderate"] == pytest.approx(1.0)
        assert r["Car_3d_hard"] == pytest.approx(0.5)   # missed hard gt

    def test_aos(self):
        # orientation similarity: one det 180 degrees off -> sim 0 for it.
        gt = _anno(["Car", "Car"], [_box(10, 0), _box(40, 5)],
                   alphas=[0.0, 1.0])
        det = _anno(["Car", "Car"], [_box(10, 0), _box(40, 5)],
                    scores=[0.9, 0.8], alphas=[0.0, 1.0 + np.pi])
        r = evaluate_annotations([gt], [det], metrics=("bbox",),
                                 num_points=0, compute_aos=True)
        assert r["Car_bbox_moderate"] == pytest.approx(1.0)
        # AOS: thresholds .9 (tp=1, sim=1) and .8 (tp=2, sim=1)
        # -> orientation [1.0, 0.5], recall [.5, 1] -> exact 0.75
        assert r["Car_aos_moderate"] == pytest.approx(0.75)

    def test_image_box_overlap_criteria(self):
        a = np.array([[0.0, 0.0, 10.0, 10.0]])
        b = np.array([[5.0, 0.0, 15.0, 10.0]])
        assert image_box_overlap(a, b)[0, 0] == pytest.approx(50 / 150)
        assert image_box_overlap(a, b, criterion=0)[0, 0] == pytest.approx(
            0.5)


class TestNativeParity:
    def test_cpp_matches_python_statistics(self, rng):
        from dcf import native
        if not native.available():
            pytest.skip("native core unavailable")
        for trial in range(20):
            d, g = rng.integers(0, 12, 2)
            overlaps = rng.uniform(0, 1, (d, g))
            scores = rng.uniform(0, 1, d)
            ig_gt = rng.choice([-1, 0, 1], g)
            ig_det = rng.choice([-1, 0, 1], d)
            dc = rng.uniform(0, 1, (d, rng.integers(0, 3))) \
                if rng.uniform() < 0.5 else None
            ga, da = rng.uniform(-3, 3, g), rng.uniform(-3, 3, d)
            thresholds = np.sort(rng.uniform(0, 1, 5))[::-1]
            got = native.eval_statistics(
                overlaps, scores, ig_gt, ig_det, dc, 0.5, thresholds,
                gt_alphas=ga, dt_alphas=da, py_fallback=_frame_statistics)
            for i, thr in enumerate(thresholds):
                tp, fp, fn, sim = _frame_statistics(
                    overlaps, scores, ig_gt, ig_det, dc, 0.5, thr,
                    gt_alphas=ga, dt_alphas=da)
                assert (got[0][i], got[1][i], got[2][i]) == (tp, fp, fn), \
                    f"trial {trial} thr {thr}"
                assert got[3][i] == pytest.approx(sim)


class TestAP:
    """Qualitative behavior (exact-AP mode unless stated)."""

    def test_no_detections(self):
        gt = [_gt([_box(10, 0)], [0])]
        det = [_det(np.zeros((0, 7)), [], [])]
        r = evaluate(gt, det, metric="3d", num_points=0)
        assert r["Car_3d_moderate"] == 0.0

    def test_false_positives_lower_ap(self):
        gt = [_gt([_box(10, 0)], [0])]
        clean = [_det([_box(10, 0)], [0], [0.9])]
        noisy = [_det([_box(10, 0), _box(50, 20), _box(60, -20)],
                      [0, 0, 0], [0.5, 0.95, 0.94])]
        r_clean = evaluate(gt, clean, metric="3d", num_points=0)
        r_noisy = evaluate(gt, noisy, metric="3d", num_points=0)
        assert r_noisy["Car_3d_moderate"] < r_clean["Car_3d_moderate"]

    def test_localization_threshold(self):
        gt = [_gt([_box(10, 0)], [0])]
        det = [_det([_box(12, 0)], [0], [0.9])]    # IoU << 0.7
        r = evaluate(gt, det, metric="3d", num_points=0)
        assert r["Car_3d_moderate"] == 0.0

    def test_class_confusion(self):
        gt = [_gt([_box(10, 0)], [0])]
        det = [_det([_box(10, 0)], [1], [0.9])]    # right box, wrong class
        r = evaluate(gt, det, metric="3d", num_points=0)
        assert r["Car_3d_moderate"] == 0.0

    def test_difficulty_ignore_semantics(self):
        gt = [_gt([_box(10, 0), _box(30, 5)], [0, 0], difficulty=[0, 2])]
        det = [_det([_box(10, 0), _box(30, 5)], [0, 0], [0.9, 0.8])]
        r = evaluate(gt, det, metric="3d", num_points=0)
        assert r["Car_3d_easy"] == pytest.approx(1.0)
        assert r["Car_3d_hard"] == pytest.approx(1.0)

    def test_difficulty2_ignored_at_moderate(self):
        # A diff-2 gt must be IGNORED (not counted) at moderate: with only
        # the diff-1 gt detected, moderate AP is 1.0, not 0.5.
        gt = [_gt([_box(10, 0), _box(30, 5)], [0, 0], difficulty=[1, 2])]
        det = [_det([_box(10, 0)], [0], [0.9])]
        r = evaluate(gt, det, metric="3d", num_points=0)
        assert r["Car_3d_moderate"] == pytest.approx(1.0)
        assert r["Car_3d_hard"] == pytest.approx(0.5)

    def test_bev_more_forgiving_than_3d(self):
        gt = [_gt([_box(10, 0)], [0])]
        b = _box(10, 0)
        b[2] += 0.8                                 # wrong height center
        det = [_det([b], [0], [0.9])]
        r3d = evaluate(gt, det, metric="3d", num_points=0)
        rbev = evaluate(gt, det, metric="bev", num_points=0)
        assert rbev["Car_bev_moderate"] >= r3d["Car_3d_moderate"]

    def test_multiframe_pooling(self):
        gt = [_gt([_box(10, 0)], [0]), _gt([_box(15, 2)], [0])]
        det = [_det([_box(10, 0)], [0], [0.9]),
               _det(np.zeros((0, 7)), [], [])]
        r = evaluate(gt, det, metric="3d", num_points=0)
        # 1 of 2 gts found at full precision -> exact AP 0.5
        assert r["Car_3d_moderate"] == pytest.approx(0.5)
