"""Pallas kernel vs jnp twin parity (SURVEY.md 4.3).

Runs in interpret mode on the CPU test backend; the same kernels compile
for real on TPU (exercised by bench/ and the flagship model path).
"""

import jax
import jax.numpy as jnp
import numpy as np
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


class TestFusedFusionKernel:
    """Fused per-scale fusion kernel vs its jnp twin, values + gradients."""

    def _mk(self, seed, H=32, W=128, cap=4, K=2, hid=16, P=512):
        from dcf.ops.pallas.fusion_kernel import fusion_windows
        rng = np.random.default_rng(seed)
        # fine-grid-sorted points (sorted by row-major cell id)
        pts = np.zeros((P, 4), np.float32)
        pts[:, 0] = rng.uniform(-1, H + 1, P)
        pts[:, 1] = rng.uniform(-1, W + 1, P)
        pts[:, 2] = rng.uniform(-2, 2, P)
        mask = rng.uniform(size=P) < 0.9
        ix = np.floor(pts[:, 0]).astype(np.int64)
        iy = np.floor(pts[:, 1]).astype(np.int64)
        inb = mask & (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
        key = np.where(inb, ix * W + iy, H * W)
        order = np.argsort(key, kind="stable")
        pts, mask = pts[order], mask[order]
        fine_row = np.where(inb, ix, 1 << 20)[order]
        pts[:, 3] = np.arange(P)

        bins = bin_points_dense(jnp.asarray(pts), jnp.asarray(mask),
                                (0.0, 0.0), 1.0, (H, W), cap)
        bbins = jax.tree.map(lambda x: x[None], bins)
        z1 = jnp.asarray(rng.normal(size=(1, P, hid)), jnp.bfloat16)
        wgt = jnp.asarray(rng.normal(size=(hid, 4)) * 0.3, jnp.float32)
        bg = jnp.asarray(rng.normal(size=(hid, 1)) * 0.1, jnp.float32)
        # capr must cover a row's 3-fine-row range plus up to 127 slots
        # of down-rounded window alignment; (384, 256) is the smallest
        # 128-multiple pair with zero overflow across the test seeds
        # while still exercising nonzero roffs and slab-start clipping
        TH, capz, capr = 8, 384, 256
        NS = (H + TH - 1) // TH
        starts, rstarts, overflow = fusion_windows(
            jnp.asarray(fine_row), NS, TH, 1, 1, capz, capr, P)
        assert int(jnp.max(overflow)) == 0
        return (bbins, z1, starts[None], rstarts[None], wgt, bg,
                (H, W, K, capz, capr))

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_jnp_twin(self, seed):
        import jax
        from dcf.ops.pallas.fusion_kernel import (fused_fusion,
                                                  fused_fusion_reference)
        bbins, z1, starts, rstarts, wgt, bg, (H, W, K, capz, capr) = \
            self._mk(seed)
        ref = fused_fusion_reference(bbins, z1, wgt, bg, (0.0, 0.0), 1.0,
                                     K, 1)
        got = fused_fusion(bbins, z1, starts, wgt, bg, (0.0, 0.0), 1.0,
                           K, radius_cells=1, tile_rows=8, capz=capz,
                           interpret=True, rstarts=rstarts, capr=capr)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # count channel: integers in [0, K]
        cnt = np.asarray(got)[..., -1]
        assert cnt.max() <= K and cnt.min() >= 0
        assert (cnt == np.round(cnt)).all()

    @pytest.mark.parametrize("sg", [1, 2, 4])
    def test_twopass_cascade_matches_onepass(self, sg):
        """The register-pressure-bounded two-pass cascade must select the
        identical neighbor set (slot order may differ -- the K-sum is
        permutation-invariant up to float reassociation)."""
        from dcf.ops.pallas.fusion_kernel import fused_fusion
        bbins, z1, starts, rstarts, wgt, bg, (H, W, K, capz, capr) = \
            self._mk(9)
        kw = dict(radius_cells=1, tile_rows=8, capz=capz, interpret=True,
                  rstarts=rstarts, capr=capr)
        one = fused_fusion(bbins, z1, starts, wgt, bg, (0.0, 0.0), 1.0,
                           K, cascade="onepass", **kw)
        two = fused_fusion(bbins, z1, starts, wgt, bg, (0.0, 0.0), 1.0,
                           K, cascade="twopass", slot_group=sg, **kw)
        # count channel counts the selected set: must be exactly equal
        np.testing.assert_array_equal(np.asarray(one)[..., -1],
                                      np.asarray(two)[..., -1])
        np.testing.assert_allclose(np.asarray(two), np.asarray(one),
                                   rtol=1e-5, atol=1e-5)

    def test_twopass_gradients_match_twin(self):
        import jax
        from dcf.ops.pallas.fusion_kernel import (fused_fusion,
                                                  fused_fusion_reference)
        bbins, z1, starts, rstarts, wgt, bg, (H, W, K, capz, capr) = \
            self._mk(4)
        probe = jnp.asarray(
            np.random.default_rng(13).normal(size=(1, H, W, z1.shape[-1]
                                                   + 1)), jnp.float32)

        def loss_ref(z1f, wgt, bg):
            out = fused_fusion_reference(bbins, z1f.astype(jnp.bfloat16),
                                         wgt, bg, (0.0, 0.0), 1.0, K, 1)
            return jnp.sum(out * probe)

        def loss_ker(z1f, wgt, bg):
            out = fused_fusion(bbins, z1f.astype(jnp.bfloat16), starts,
                               wgt, bg, (0.0, 0.0),
                               1.0, K, radius_cells=1, tile_rows=8,
                               capz=capz, interpret=True,
                               cascade="twopass", rstarts=rstarts,
                               capr=capr)
            return jnp.sum(out * probe)

        z1f = z1.astype(jnp.float32)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(z1f, wgt, bg)
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(z1f, wgt, bg)
        for a, b, name in zip(gr, gk, ("z1", "wgt", "bg")):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, rtol=5e-2, atol=8e-2,
                                       err_msg=name)

    def test_gradients_match_twin(self):
        import jax
        from dcf.ops.pallas.fusion_kernel import (fused_fusion,
                                                  fused_fusion_reference)
        bbins, z1, starts, rstarts, wgt, bg, (H, W, K, capz, capr) = \
            self._mk(3)
        probe = jnp.asarray(
            np.random.default_rng(7).normal(size=(1, H, W, z1.shape[-1]
                                                  + 1)), jnp.float32)

        def loss_ref(z1f, wgt, bg):
            out = fused_fusion_reference(bbins, z1f.astype(jnp.bfloat16),
                                         wgt, bg, (0.0, 0.0), 1.0, K, 1)
            return jnp.sum(out * probe)

        def loss_ker(z1f, wgt, bg):
            out = fused_fusion(bbins, z1f.astype(jnp.bfloat16), starts,
                               wgt, bg, (0.0, 0.0),
                               1.0, K, radius_cells=1, tile_rows=8,
                               capz=capz, interpret=True,
                               rstarts=rstarts, capr=capr)
            return jnp.sum(out * probe)

        z1f = z1.astype(jnp.float32)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(z1f, wgt, bg)
        gk = jax.grad(loss_ker, argnums=(0, 1, 2))(z1f, wgt, bg)
        # d_z1 runs through a bf16 MXU segment-sum in the kernel while the
        # twin accumulates f32 -- tolerances are bf16-grade (the twin's
        # own forward is bf16 too, so training sees the same noise floor)
        for a, b, name in zip(gr, gk, ("z1", "wgt", "bg")):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(a, b, rtol=5e-2, atol=8e-2,
                                       err_msg=name)
            # and the overall direction/scale agree tightly
            denom = np.linalg.norm(a.ravel()) * np.linalg.norm(b.ravel())
            cos = float(np.dot(a.ravel(), b.ravel()) / max(denom, 1e-9))
            assert cos > 0.999, (name, cos)

    def test_row_window_matches_full_window(self):
        """The per-row z1 window (capr < capz, the production FLOP
        saver) must not change the forward or any cotangent vs running
        every row against the whole slab."""
        import jax
        from dcf.ops.pallas.fusion_kernel import fused_fusion
        bbins, z1, starts, rstarts, wgt, bg, (H, W, K, capz, capr) = \
            self._mk(5)
        probe = jnp.asarray(
            np.random.default_rng(11).normal(size=(1, H, W, z1.shape[-1]
                                                   + 1)), jnp.float32)

        def loss(z1f, wgt, bg, rs, cr):
            out = fused_fusion(bbins, z1f.astype(jnp.bfloat16), starts,
                               wgt, bg, (0.0, 0.0),
                               1.0, K, radius_cells=1, tile_rows=8,
                               capz=capz, interpret=True,
                               rstarts=rs, capr=cr)
            return jnp.sum(out * probe), out

        z1f = z1.astype(jnp.float32)
        (_, o_full), g_full = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(z1f, wgt, bg,
                                                   None, None)
        (_, o_win), g_win = jax.value_and_grad(
            loss, argnums=(0, 1, 2), has_aux=True)(z1f, wgt, bg,
                                                   rstarts, capr)
        # identical pair set selected -> identical sums, element-wise
        np.testing.assert_array_equal(np.asarray(o_full),
                                      np.asarray(o_win))
        np.testing.assert_array_equal(np.asarray(g_full[0]),
                                      np.asarray(g_win[0]), err_msg="z1")
        for a, b, name in zip(g_full[1:], g_win[1:], ("wgt", "bg")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4, err_msg=name)

    def test_empty_points(self):
        from dcf.ops.pallas.fusion_kernel import fused_fusion
        H, W, cap, K, hid, P = 8, 128, 2, 2, 16, 128
        bins = bin_points_dense(jnp.zeros((P, 4)), jnp.zeros(P, bool),
                                (0.0, 0.0), 1.0, (H, W), cap)
        bbins = jax.tree.map(lambda x: x[None], bins)
        z1t = jnp.zeros((1, P, hid), jnp.bfloat16)
        out = fused_fusion(bbins, z1t, jnp.zeros((1, 1), jnp.int32),
                           jnp.zeros((hid, 4)), jnp.zeros((hid, 1)),
                           (0.0, 0.0), 1.0, K, radius_cells=1,
                           tile_rows=8, capz=128, interpret=True)
        assert not np.asarray(out).any()


class TestClipKernel:
    """Pallas pairwise rotated-clip kernel vs the jnp clip."""

    def _boxes(self, rng, n):
        b = np.stack([rng.uniform(-5, 5, n), rng.uniform(-5, 5, n),
                      rng.uniform(0.5, 5, n), rng.uniform(0.5, 5, n),
                      rng.uniform(-np.pi, np.pi, n)], 1)
        return b.astype(np.float32)

    def test_pairs_match_jnp(self, rng):
        from dcf.geometry.boxes import rotated_intersection_area
        from dcf.ops.pallas.clip_kernel import (
            rotated_intersection_area_pairs)
        P = 2500
        a, b = self._boxes(rng, P), self._boxes(rng, P)
        b[:P // 2, :2] = a[:P // 2, :2] + rng.uniform(-1, 1, (P // 2, 2))
        ref = rotated_intersection_area(jnp.asarray(a), jnp.asarray(b))
        got = rotated_intersection_area_pairs(jnp.asarray(a),
                                              jnp.asarray(b),
                                              interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_nms_with_precomputed_iou_identical(self, rng):
        from dcf.geometry.boxes import rotated_iou_bev
        from dcf.ops.pallas.clip_kernel import rotated_iou_bev_matrix
        from dcf.ops.nms import rotated_nms_parallel
        K = 64
        boxes = self._boxes(rng, K)
        boxes[:, :2] *= 0.4                      # force real overlaps
        scores = rng.uniform(0.1, 1.0, K).astype(np.float32)
        valid = rng.uniform(size=K) < 0.9
        bj = jnp.asarray(boxes)
        idx0, keep0 = rotated_nms_parallel(bj, jnp.asarray(scores),
                                           jnp.asarray(valid), 0.3, 16)
        iou = rotated_iou_bev_matrix(bj, bj, interpret=True)
        idx1, keep1 = rotated_nms_parallel(None, jnp.asarray(scores),
                                           jnp.asarray(valid), 0.3, 16,
                                           precomputed_iou=iou)
        np.testing.assert_array_equal(np.asarray(idx0), np.asarray(idx1))
        np.testing.assert_array_equal(np.asarray(keep0), np.asarray(keep1))

    def test_assigner_pallas_clip_matches(self, rng):
        """Windowed assignment with the kernel clip == jnp clip
        (vmapped over the batch, interpret mode)."""
        import functools
        from unittest import mock
        from dcf.config import tiny_config
        from dcf.models.anchors import anchor_grid_shape, generate_anchors
        from dcf.ops.pallas import clip_kernel
        from dcf.train.targets import assign_targets_batch
        cfg = tiny_config()
        anchors, classes, mt, ut = generate_anchors(cfg)
        Hd, Wd, A = anchor_grid_shape(cfg)
        B, G = 2, 6
        gt = np.zeros((B, G, 7), np.float32)
        gt[..., 0] = rng.uniform(2, 23, (B, G))
        gt[..., 1] = rng.uniform(-11, 11, (B, G))
        gt[..., 2] = -1.0
        gt[..., 3:6] = np.array([3.9, 1.6, 1.56])
        gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
        labels = rng.integers(0, 3, (B, G)).astype(np.int32)
        mask = rng.uniform(size=(B, G)) < 0.8
        kwargs = dict(
            grid_shape=(Hd, Wd, A),
            grid_origin=(cfg.voxel.x_min, cfg.voxel.y_min),
            grid_cell=cfg.voxel.voxel_size * cfg.backbone.head_stride,
            per_class_anchors=2)
        args = (jnp.asarray(anchors), jnp.asarray(classes),
                jnp.asarray(mt), jnp.asarray(ut), jnp.asarray(gt),
                jnp.asarray(labels), jnp.asarray(mask))
        ref = assign_targets_batch(*args, **kwargs)
        interp = functools.partial(
            clip_kernel.rotated_intersection_area_pairs, interpret=True)
        with mock.patch.object(clip_kernel,
                               "rotated_intersection_area_pairs", interp):
            got = assign_targets_batch(*args, use_pallas_clip=True,
                                       **kwargs)
        # kernel areas differ from the jnp clip by float reassociation
        # (~1e-5): anchors whose IoU sits exactly on a threshold may flip.
        # Require agreement everywhere else.
        ref_cls = np.asarray(ref.cls_target)
        got_cls = np.asarray(got.cls_target)
        flips = ref_cls != got_cls
        assert flips.mean() < 3e-3, flips.mean()
        agree_pos = (ref_cls == 1) & (got_cls == 1)
        # reg_target is channel-major [B, 7, N]; move channels last to
        # index with the [B, N] agreement mask
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(ref.reg_target), 1, -1)[agree_pos],
            np.moveaxis(np.asarray(got.reg_target), 1, -1)[agree_pos],
            atol=1e-5)
        d_pos = abs(float(np.asarray(ref.num_pos).sum())
                    - float(np.asarray(got.num_pos).sum()))
        assert d_pos <= flips.sum()


class TestBinPointsPlanes:
    def test_matches_build_planes(self, rng):
        """Direct planes scatter == bin_points_dense + build_planes."""
        from dcf.ops.pallas.fusion_kernel import (bin_points_planes,
                                                  build_planes)
        H, W, C, r, tile_rows = 24, 130, 3, 1, 8
        P = 700
        pts = np.zeros((P, 4), np.float32)
        pts[:, 0] = rng.uniform(-2, H + 2, P)
        pts[:, 1] = rng.uniform(-2, W + 2, P)
        pts[:, 2] = rng.uniform(-2, 2, P)
        pts[:, 3] = np.arange(P)
        mask = rng.uniform(size=P) < 0.9
        bins = bin_points_dense(jnp.asarray(pts), jnp.asarray(mask),
                                (0.0, 0.0), 1.0, (H, W), C)
        ref = build_planes(jax.tree.map(lambda x: x[None], bins), r,
                           tile_rows, (0.0, 0.0), 1.0)[0]
        got = bin_points_planes(jnp.asarray(pts), jnp.asarray(mask),
                                (0.0, 0.0), 1.0, (H, W), C, r, tile_rows)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_multi_scale_scatter_matches_per_scale(self, rng):
        """The one fused multi-scale scatter must equal per-scale
        bin_points_planes_ranked bit-for-bit at every scale."""
        from dcf.ops.pallas.fusion_kernel import (bin_points_planes_multi,
                                                  bin_points_planes_ranked)
        grids = [(24, 130), (12, 65), (6, 33)]
        cells = [1.0, 2.0, 4.0]
        C, r, tile_rows = 3, 1, 8
        P = 700
        pts = np.zeros((P, 4), np.float32)
        pts[:, 0] = rng.uniform(-2, 26, P)
        pts[:, 1] = rng.uniform(-2, 132, P)
        pts[:, 2] = rng.uniform(-2, 2, P)
        pts[:, 3] = np.arange(P)
        # host-style per-scale ranks: stable rank within each scale's
        # cell among that scale's valid points
        ranks = np.full((len(grids), P), -1, np.int32)
        for s, ((H, W), cell) in enumerate(zip(grids, cells)):
            ok = rng.uniform(size=P) < 0.85
            ix = np.floor(pts[:, 0] / cell).astype(np.int64)
            iy = np.floor(pts[:, 1] / cell).astype(np.int64)
            ok &= (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
            cid = np.where(ok, ix * W + iy, H * W)
            order = np.argsort(cid, kind="stable")
            sc = cid[order]
            start = np.r_[True, sc[1:] != sc[:-1]]
            run_start = np.maximum.accumulate(
                np.where(start, np.arange(P), 0))
            rk = np.arange(P) - run_start
            vs = ok[order]
            ranks[s, order[vs]] = rk[vs]
        got = bin_points_planes_multi(
            jnp.asarray(pts), jnp.asarray(ranks), (0.0, 0.0), cells,
            grids, C, r, tile_rows)
        for s, ((H, W), cell) in enumerate(zip(grids, cells)):
            ref = bin_points_planes_ranked(
                jnp.asarray(pts), jnp.asarray(ranks[s]), (0.0, 0.0),
                cell, (H, W), C, r, tile_rows)
            np.testing.assert_array_equal(np.asarray(got[s]),
                                          np.asarray(ref), err_msg=str(s))

    @pytest.mark.parametrize("rho", [2, 4])
    def test_coarse_rank_matches_argsort_path(self, rng, rho):
        """The sort-free coarse-scale path (rank from fine-cell count
        images; fine cells nest in coarse cells) must reproduce the
        stable-argsort path's planes exactly: same slot assignment,
        same over-capacity drops, with a zero-padding tail (sort-invalid
        but spatially at the grid origin) and interspersed image-masked
        points."""
        from dcf.ops.pallas.fusion_kernel import bin_points_planes
        Hf, Wf = 24, 128
        H, W = Hf // rho, Wf // rho
        C, r, tile_rows = 2, 1, 8
        P, PAD = 900, 120
        pts = np.zeros((P, 4), np.float32)
        pts[:, 0] = rng.integers(-1, Hf + 1, P) + rng.uniform(0, 1, P)
        pts[:, 1] = rng.integers(-1, 8, P) * (Wf // 8) + rng.uniform(0, 1, P)
        pts[:, 2] = rng.uniform(-2, 2, P)
        sort_msk = rng.uniform(size=P) < 0.9
        sort_msk[-PAD:] = False              # zero-coord padding tail
        pts[~sort_msk] = 0.0                 # lands in-grid at the origin
        ix = np.floor(pts[:, 0]).astype(int)
        iy = np.floor(pts[:, 1]).astype(int)
        ing = (ix >= 0) & (ix < Hf) & (iy >= 0) & (iy < Wf)
        key = np.where(sort_msk & ing, ix * Wf + iy, Hf * Wf)
        order = np.argsort(key, kind="stable")
        pts, sort_msk = pts[order], sort_msk[order]
        pts[:, 3] = np.arange(P)
        img_ok = sort_msk & (rng.uniform(size=P) < 0.8)   # NOT sorted
        sort_valid = jnp.asarray(key[order] < Hf * Wf)
        ref = bin_points_planes(jnp.asarray(pts), jnp.asarray(img_ok),
                                (0.0, 0.0), float(rho), (H, W), C, r,
                                tile_rows, presorted=False)
        got = bin_points_planes(jnp.asarray(pts), jnp.asarray(img_ok),
                                (0.0, 0.0), float(rho), (H, W), C, r,
                                tile_rows, fine_ratio=rho,
                                sort_valid=sort_valid)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_presorted_matches_argsort_path(self, rng):
        """The sort-free presorted path (fine scale) must produce the
        exact same planes as the stable-argsort path, including bins
        over capacity and interspersed invalid (image-masked) points."""
        from dcf.ops.pallas.fusion_kernel import bin_points_planes
        H, W, C, r, tile_rows = 24, 130, 2, 1, 8
        P = 900
        pts = np.zeros((P, 4), np.float32)
        # cluster points so many cells exceed capacity C=2
        pts[:, 0] = rng.integers(-1, H + 1, P) + rng.uniform(0, 1, P)
        pts[:, 1] = rng.integers(-1, 8, P) * (W // 8) + rng.uniform(0, 1, P)
        pts[:, 2] = rng.uniform(-2, 2, P)
        pts[:, 3] = np.arange(P)
        # sort by row-major cell with out-of-grid last (the fine sort)
        ix = np.floor(pts[:, 0]).astype(int)
        iy = np.floor(pts[:, 1]).astype(int)
        ing = (ix >= 0) & (ix < H) & (iy >= 0) & (iy < W)
        key = np.where(ing, ix * W + iy, H * W)
        order = np.argsort(key, kind="stable")
        pts = pts[order]
        mask = rng.uniform(size=P) < 0.7      # img_ok: NOT sorted
        ref = bin_points_planes(jnp.asarray(pts), jnp.asarray(mask),
                                (0.0, 0.0), 1.0, (H, W), C, r, tile_rows,
                                presorted=False)
        got = bin_points_planes(jnp.asarray(pts), jnp.asarray(mask),
                                (0.0, 0.0), 1.0, (H, W), C, r, tile_rows,
                                presorted=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
