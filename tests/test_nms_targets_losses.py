"""Rotated NMS, target assignment, and loss tests (SURVEY.md 4.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from dcf.geometry import np_boxes
from dcf.ops.nms import rotated_nms
from dcf.train.losses import (add_sin_difference, detection_loss,
                              sigmoid_focal_loss, smooth_l1)
from dcf.train.targets import assign_targets
from dcf.config import LossConfig
from dcf.train.targets import AnchorTargets


def np_greedy_nms(boxes5, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        iou = np_boxes.rotated_iou_bev(boxes5[idx:idx + 1], boxes5)[0]
        suppressed |= iou > thr
    return keep


class TestRotatedNMS:
    def test_matches_numpy_greedy(self, rng):
        n = 64
        boxes = np.zeros((n, 5))
        boxes[:, :2] = rng.uniform(-10, 10, (n, 2))
        boxes[:, 2:4] = rng.uniform(1, 4, (n, 2))
        boxes[:, 4] = rng.uniform(-3, 3, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        want = np_greedy_nms(boxes, scores, 0.3)
        idx, keep = rotated_nms(jnp.asarray(boxes, jnp.float32),
                                jnp.asarray(scores),
                                jnp.ones(n, bool), 0.3, 16)
        got = list(np.asarray(idx)[np.asarray(keep)])
        assert got == want[:len(got)]

    def test_respects_validity(self):
        boxes = jnp.asarray([[0, 0, 2, 2, 0.0], [10, 10, 2, 2, 0.0]],
                            jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        valid = jnp.asarray([False, True])
        idx, keep = rotated_nms(boxes, scores, valid, 0.5, 2)
        kept = np.asarray(idx)[np.asarray(keep)]
        assert list(kept) == [1]

    def test_suppresses_duplicates(self):
        boxes = jnp.asarray([[0, 0, 2, 2, 0.0], [0.1, 0, 2, 2, 0.05],
                             [10, 10, 2, 2, 0.0]], jnp.float32)
        scores = jnp.asarray([0.9, 0.85, 0.5])
        idx, keep = rotated_nms(boxes, scores, jnp.ones(3, bool), 0.3, 3)
        kept = sorted(np.asarray(idx)[np.asarray(keep)])
        assert kept == [0, 2]


def _anchor_setup():
    # 4 anchors: two at origin-ish (class 0, rot 0/90), two far away
    anchors = np.array([
        [5.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.0],
        [5.0, 5.0, -1.0, 3.9, 1.6, 1.56, np.pi / 2],
        [30.0, 30.0, -1.0, 3.9, 1.6, 1.56, 0.0],
        [30.0, 30.0, -1.0, 0.8, 0.6, 1.73, 0.0],
    ], np.float32)
    classes = np.array([0, 0, 0, 1], np.int32)
    m = np.array([0.6, 0.6, 0.6, 0.5], np.float32)
    u = np.array([0.45, 0.45, 0.45, 0.35], np.float32)
    return map(jnp.asarray, (anchors, classes, m, u))


class TestTargetAssignment:
    def test_positive_and_negative(self):
        anchors, classes, m, u = _anchor_setup()
        gt = jnp.asarray([[5.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.1]],
                         jnp.float32)
        t = assign_targets(anchors, classes, m, u, gt,
                           jnp.asarray([0], jnp.int32),
                           jnp.asarray([True]))
        ct = np.asarray(t.cls_target)
        assert ct[0] == 1.0           # aligned anchor: high IoU positive
        assert ct[2] == 0.0           # far anchor negative
        assert ct[3] == 0.0           # wrong class
        assert float(t.num_pos) >= 1

    def test_masked_gt_ignored(self):
        anchors, classes, m, u = _anchor_setup()
        gt = jnp.asarray([[5.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.0]],
                         jnp.float32)
        t = assign_targets(anchors, classes, m, u, gt,
                           jnp.asarray([0], jnp.int32),
                           jnp.asarray([False]))
        assert float(t.num_pos) == 0
        assert np.asarray(t.cls_weight).all()   # everything negative

    def test_force_match(self):
        # gt overlapping an anchor but below matched_threshold: the best
        # anchor must still become positive
        anchors, classes, m, u = _anchor_setup()
        gt = jnp.asarray([[6.5, 6.0, -1.0, 3.9, 1.6, 1.56, 0.8]],
                         jnp.float32)
        t = assign_targets(anchors, classes, m, u, gt,
                           jnp.asarray([0], jnp.int32),
                           jnp.asarray([True]))
        assert float(t.num_pos) >= 1

    def test_encode_decode_consistency(self):
        from dcf.geometry.boxes import decode_boxes
        anchors, classes, m, u = _anchor_setup()
        gt_box = [5.2, 4.9, -0.9, 4.1, 1.7, 1.5, 0.15]
        t = assign_targets(anchors, classes, m, u,
                           jnp.asarray([gt_box], jnp.float32),
                           jnp.asarray([0], jnp.int32),
                           jnp.asarray([True]))
        pos = np.asarray(t.reg_weight) > 0
        dec = np.asarray(decode_boxes(t.reg_target.T, anchors))
        for i in np.where(pos)[0]:
            np.testing.assert_allclose(dec[i], gt_box, atol=1e-3)


class TestLosses:
    def test_focal_matches_torch(self, rng):
        logits = rng.normal(0, 2, 100).astype(np.float32)
        targets = (rng.uniform(size=100) < 0.3).astype(np.float32)
        got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits),
                                            jnp.asarray(targets),
                                            0.25, 2.0))
        # independent torch implementation (torchvision formula)
        t_log = torch.from_numpy(logits)
        t_tar = torch.from_numpy(targets)
        p = torch.sigmoid(t_log)
        ce = torch.nn.functional.binary_cross_entropy_with_logits(
            t_log, t_tar, reduction="none")
        p_t = p * t_tar + (1 - p) * (1 - t_tar)
        alpha_t = 0.25 * t_tar + 0.75 * (1 - t_tar)
        want = (alpha_t * (1 - p_t) ** 2 * ce).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_smooth_l1_matches_torch(self, rng):
        pred = rng.normal(0, 1, 50).astype(np.float32)
        tar = rng.normal(0, 1, 50).astype(np.float32)
        beta = 1.0 / 9.0
        got = np.asarray(smooth_l1(jnp.asarray(pred), jnp.asarray(tar),
                                   beta))
        want = torch.nn.functional.smooth_l1_loss(
            torch.from_numpy(pred), torch.from_numpy(tar), beta=beta,
            reduction="none").numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_sin_difference_periodicity(self):
        # loss must be identical for angles differing by pi
        p = jnp.zeros((1, 7))
        t1 = jnp.zeros((1, 7)).at[0, 6].set(0.3)
        t2 = jnp.zeros((1, 7)).at[0, 6].set(0.3 + np.pi)
        p1, q1 = add_sin_difference(p, t1)
        p2, q2 = add_sin_difference(p, t2)
        l1 = smooth_l1(p1, q1, 1 / 9).sum()
        l2 = smooth_l1(p2, q2, 1 / 9).sum()
        np.testing.assert_allclose(float(l1), float(l2), atol=1e-6)

    def test_detection_loss_finite_and_grads(self, rng):
        B, N = 2, 40
        flat = {"cls": jnp.asarray(rng.normal(0, 1, (B, N)), jnp.float32),
                "reg": jnp.asarray(rng.normal(0, 0.2, (B, N, 7)),
                                   jnp.float32),
                "dir": jnp.asarray(rng.normal(0, 1, (B, N, 2)),
                                   jnp.float32)}
        targets = AnchorTargets(
            cls_target=jnp.asarray((rng.uniform(size=(B, N)) < 0.1)
                                   .astype(np.float32)),
            cls_weight=jnp.ones((B, N)),
            reg_target=jnp.asarray(rng.normal(0, 0.2, (B, 7, N)),
                                   jnp.float32),
            reg_weight=jnp.asarray((rng.uniform(size=(B, N)) < 0.1)
                                   .astype(np.float32)),
            dir_target=jnp.asarray(rng.integers(0, 2, (B, N)), jnp.int32),
            num_pos=jnp.asarray([4.0, 4.0]))
        loss, metrics = detection_loss(flat, targets, LossConfig())
        assert np.isfinite(float(loss))
        grads = jax.grad(
            lambda f: detection_loss(f, targets, LossConfig())[0])(flat)
        for g in jax.tree.leaves(grads):
            assert np.isfinite(np.asarray(g)).all()


class TestWindowedAssignment:
    def test_matches_dense(self, rng):
        """Windowed assignment == dense assignment on a realistic grid."""
        import jax.numpy as jnp
        from dcf.config import tiny_config
        from dcf.models.anchors import anchor_grid_shape, generate_anchors
        from dcf.train.targets import assign_targets, assign_targets_dense
        cfg = tiny_config()
        anchors, classes, mt, ut = generate_anchors(cfg)
        Hd, Wd, A = anchor_grid_shape(cfg)
        G = 8
        gt = np.zeros((G, 7), np.float32)
        gt[:, 0] = rng.uniform(2, 23, G)
        gt[:, 1] = rng.uniform(-11, 11, G)
        gt[:, 2] = -1.0
        gt[:, 3:6] = np.array([3.9, 1.6, 1.56]) * rng.uniform(0.8, 1.2,
                                                              (G, 3))
        gt[:, 6] = rng.uniform(-np.pi, np.pi, G)
        labels = rng.integers(0, 3, G).astype(np.int32)
        mask = rng.uniform(size=G) < 0.8

        args = (jnp.asarray(anchors), jnp.asarray(classes),
                jnp.asarray(mt), jnp.asarray(ut), jnp.asarray(gt),
                jnp.asarray(labels), jnp.asarray(mask))
        dense = assign_targets_dense(*args)
        rot_counts = {len(a.rotations) for a in cfg.anchors}
        pca = rot_counts.pop() if len(rot_counts) == 1 else None
        assert pca is not None          # exercise the class-window path
        # window=32 is the conservative bound; 24 is the production
        # default (TrainConfig.assigner_window) -- both must match dense
        # exactly on KITTI-sized boxes (coverage argument in config.py).
        for per_class, window in ((None, 32), (pca, 32), (pca, 24)):
            windowed = assign_targets(
                *args, grid_shape=(Hd, Wd, A),
                grid_origin=(cfg.voxel.x_min, cfg.voxel.y_min),
                grid_cell=cfg.voxel.voxel_size * cfg.backbone.head_stride,
                window=window, per_class_anchors=per_class)
            np.testing.assert_array_equal(np.asarray(dense.cls_target),
                                          np.asarray(windowed.cls_target))
            np.testing.assert_array_equal(np.asarray(dense.cls_weight),
                                          np.asarray(windowed.cls_weight))
            np.testing.assert_allclose(np.asarray(dense.reg_target),
                                       np.asarray(windowed.reg_target),
                                       atol=1e-5)
            assert float(dense.num_pos) == float(windowed.num_pos)
            assert float(windowed.num_pos) > 0


class TestParallelNMS:
    def test_matches_greedy(self, rng):
        from dcf.ops.nms import rotated_nms_parallel
        for trial in range(3):
            n = 96
            boxes = np.zeros((n, 5))
            boxes[:, :2] = rng.uniform(-12, 12, (n, 2))
            boxes[:, 2:4] = rng.uniform(1, 4, (n, 2))
            boxes[:, 4] = rng.uniform(-3, 3, n)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            valid = rng.uniform(size=n) < 0.9
            want = [i for i in np_greedy_nms(boxes, scores, 0.3)
                    if valid[i]]
            # greedy over only valid boxes
            want = []
            suppressed = ~valid.copy()
            for idx in np.argsort(-scores):
                if suppressed[idx]:
                    continue
                want.append(idx)
                iou = np_boxes.rotated_iou_bev(boxes[idx:idx + 1],
                                               boxes)[0]
                suppressed |= iou > 0.3
            idx, keep = rotated_nms_parallel(
                jnp.asarray(boxes, jnp.float32), jnp.asarray(scores),
                jnp.asarray(valid), 0.3, 24)
            got = list(np.asarray(idx)[np.asarray(keep)])
            assert got == sorted(want, key=lambda i: -scores[i])[:len(got)]
