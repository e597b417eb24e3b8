"""Model assembly tests: shapes, configs, decode, static-shape invariants
(SURVEY.md 4.4/4.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcf.config import tiny_config
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_frame
from dcf.eval.inference import make_inference_fn, device_anchor_pack
from dcf.models.anchors import anchor_grid_shape, generate_anchors
from dcf.models.detector import ContFuseDetector


@pytest.fixture(scope="module")
def fusion_setup():
    cfg = tiny_config(with_fusion=True)
    model = ContFuseDetector(cfg)
    batch = {k: jnp.asarray(v) for k, v in stack_examples(
        [frame_to_example(make_frame(seed=0), cfg)]).items()}
    params = jax.jit(model.init)(jax.random.key(0), batch)
    return cfg, model, batch, params


class TestAnchors:
    def test_grid_shape_and_layout(self):
        cfg = tiny_config()
        H, W, A = anchor_grid_shape(cfg)
        anchors, classes, m, u = generate_anchors(cfg)
        assert anchors.shape == (H * W * A, 7)
        assert A == 6  # 3 classes x 2 rotations
        # location-major ordering: first A anchors share one center
        assert np.allclose(anchors[:A, 0], anchors[0, 0])
        assert np.allclose(anchors[:A, 1], anchors[0, 1])
        # class pattern repeats per location
        assert list(classes[:A]) == [0, 0, 1, 1, 2, 2]
        assert list(classes[A:2 * A]) == [0, 0, 1, 1, 2, 2]

    def test_anchor_centers_inside_roi(self):
        cfg = tiny_config()
        anchors, *_ = generate_anchors(cfg)
        v = cfg.voxel
        assert (anchors[:, 0] > v.x_min).all() and (
            anchors[:, 0] < v.x_max).all()
        assert (anchors[:, 1] > v.y_min).all() and (
            anchors[:, 1] < v.y_max).all()


class TestForward:
    def test_fusion_forward_shapes(self, fusion_setup):
        cfg, model, batch, params = fusion_setup
        preds = jax.jit(model.apply)(params, batch)
        H, W, A = anchor_grid_shape(cfg)
        assert preds["cls"].shape == (1, H, W, A)
        assert preds["reg"].shape == (1, H, W, A * 7)
        assert preds["dir"].shape == (1, H, W, A * 2)
        for v in preds.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_lidar_only_forward(self):
        cfg = tiny_config(with_fusion=False)
        model = ContFuseDetector(cfg)
        batch = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(make_frame(seed=1), cfg)]).items()}
        params = jax.jit(model.init)(jax.random.key(0), batch)
        preds = jax.jit(model.apply)(params, batch)
        assert np.isfinite(np.asarray(preds["cls"])).all()
        # no image backbone params in lidar-only config
        assert "image_backbone" not in params["params"]

    def test_end_to_end_decode(self, fusion_setup):
        cfg, model, batch, params = fusion_setup
        infer = jax.jit(make_inference_fn(cfg, model))
        pack = device_anchor_pack(cfg)
        out = infer(params, batch, pack)
        D = cfg.head.max_detections
        assert out["boxes"].shape == (1, D, 7)
        assert out["scores"].shape == (1, D)
        assert np.isfinite(np.asarray(out["boxes"])).all()
        s = np.asarray(out["scores"])[0]
        assert (np.diff(s) <= 1e-6).all()      # descending scores

    def test_batch_independence(self, fusion_setup):
        """Frame order in the batch must not change per-frame results."""
        cfg, model, _, params = fusion_setup
        e0 = frame_to_example(make_frame(seed=3), cfg)
        e1 = frame_to_example(make_frame(seed=4,
                                         boxes=[("Car", 10.0, -3.0, 1.0)]),
                              cfg)
        fwd = jax.jit(model.apply)
        p01 = fwd(params, {k: jnp.asarray(v) for k, v in
                           stack_examples([e0, e1]).items()})
        p10 = fwd(params, {k: jnp.asarray(v) for k, v in
                           stack_examples([e1, e0]).items()})
        np.testing.assert_allclose(np.asarray(p01["cls"][0]),
                                   np.asarray(p10["cls"][1]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p01["cls"][1]),
                                   np.asarray(p10["cls"][0]), atol=1e-5)

    def test_fusion_uses_image(self, fusion_setup):
        """Zeroing the image must change fused predictions (the camera
        stream is actually wired in)."""
        cfg, model, batch, params = fusion_setup
        fwd = jax.jit(model.apply)
        p1 = fwd(params, batch)
        b2 = dict(batch)
        b2["image"] = jnp.zeros_like(batch["image"])
        p2 = fwd(params, b2)
        assert not np.allclose(np.asarray(p1["cls"]), np.asarray(p2["cls"]),
                               atol=1e-6)

    def test_host_sorted_points_parity(self):
        """Host pre-sort + in-jit row ids == in-jit argsort, exactly.

        The flagship default (FusionConfig.host_sorted_points) moves the
        fine-grid sort into frame_to_example; the detector must produce
        bit-identical predictions either way on the same frame.

        The host-computed batch keys (uvz/ranks/row_cum) are stripped
        from BOTH sides so this isolates the SORT lever: with them only
        on one side the two jit graphs differ structurally, and XLA's
        per-graph FMA-contraction choices flip a handful of
        bf16-rounding-boundary bilinear samples (observed 6/65536
        elements at one bf16 ulp) -- a compiler artifact, not a model
        difference. The host-array keys have their own parity tests
        (test_host_binned_ranks_parity, test_host_uvz_matches_device,
        test_host_row_cum_matches_device).
        """
        import dataclasses
        frame = make_frame(seed=3)
        cfg_on = tiny_config(with_fusion=True)
        assert cfg_on.fusion.host_sorted_points
        cfg_off = dataclasses.replace(
            cfg_on, fusion=dataclasses.replace(
                cfg_on.fusion, host_sorted_points=False))

        host_keys = ("points_uvz", "fusion_rank", "fusion_row_cum")
        b_on = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(frame, cfg_on)]).items()
            if k not in host_keys}
        b_off = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(frame, cfg_off)]).items()
            if k not in host_keys}
        # host sort only reorders the padded cloud
        assert not np.array_equal(np.asarray(b_on["points"]),
                                  np.asarray(b_off["points"]))
        assert np.allclose(np.asarray(b_on["points"]).sum(axis=1),
                           np.asarray(b_off["points"]).sum(axis=1),
                           atol=1e-3)

        model_on = ContFuseDetector(cfg_on)
        model_off = ContFuseDetector(cfg_off)
        params = jax.jit(model_on.init)(jax.random.key(0), b_on)
        p_on = jax.jit(model_on.apply)(params, b_on)
        p_off = jax.jit(model_off.apply)(params, b_off)
        for k in p_on:
            np.testing.assert_array_equal(np.asarray(p_on[k]),
                                          np.asarray(p_off[k]), err_msg=k)

    def test_host_s2d_image_parity(self):
        """Host space-to-depth'd image batches (ImageConfig.host_s2d,
        the production path) == raw [H, W, 3] batches, bit-identical:
        the backbone's in-graph s2d branch and dcf.data.preprocess
        .s2d_image implement the same layout."""
        from dcf.data.preprocess import s2d_image
        from dcf.data.synthetic import make_varied_frame
        frame = make_varied_frame(seed=7)
        cfg = tiny_config(with_fusion=True)
        assert cfg.image.host_s2d

        b_s2d = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(frame, cfg)]).items()}
        assert b_s2d["image"].shape[-1] == 48
        img = np.asarray(b_s2d["image"][0])
        H4, W4, _ = img.shape
        raw = (img.reshape(H4, W4, 4, 4, 3).transpose(0, 2, 1, 3, 4)
               .reshape(H4 * 4, W4 * 4, 3))
        np.testing.assert_array_equal(s2d_image(raw), img)  # layout inverse
        b_raw = dict(b_s2d)
        b_raw["image"] = jnp.asarray(raw[None])

        model = ContFuseDetector(cfg)
        params = jax.jit(model.init)(jax.random.key(0), b_s2d)
        p_a = jax.jit(model.apply)(params, b_s2d)
        p_b = jax.jit(model.apply)(params, b_raw)
        for k in p_a:
            np.testing.assert_array_equal(np.asarray(p_a[k]),
                                          np.asarray(p_b[k]), err_msg=k)

    def test_host_binned_ranks_parity(self):
        """Host-precomputed projection + per-scale bin ranks == the
        on-device binning, exactly.

        The flagship default (FusionConfig.host_binned_ranks) computes
        fusion_host_arrays in frame_to_example; stripping those batch
        keys makes the detector fall back to the on-device path, and
        the predictions must be bit-identical.
        """
        from dcf.data.synthetic import make_varied_frame
        frame = make_varied_frame(seed=5)
        cfg = tiny_config(with_fusion=True)
        assert cfg.fusion.host_binned_ranks

        b_on = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(frame, cfg)]).items()}
        assert "fusion_rank" in b_on and "points_uvz" in b_on
        b_off = {k: v for k, v in b_on.items()
                 if k not in ("fusion_rank", "points_uvz")}

        model = ContFuseDetector(cfg)
        params = jax.jit(model.init)(jax.random.key(0), b_on)
        p_on = jax.jit(model.apply)(params, b_on)
        p_off = jax.jit(model.apply)(params, b_off)
        for k in p_on:
            np.testing.assert_array_equal(np.asarray(p_on[k]),
                                          np.asarray(p_off[k]), err_msg=k)

    def test_host_uvz_matches_device(self):
        """Host-projected points_uvz == the jitted device projection,
        bit-for-bit (numpy f32 sgemm vs XLA:CPU Precision.HIGHEST dot
        -- the precision note in dcf.geometry.transforms
        .project_velo_to_image)."""
        from dcf.data.synthetic import make_varied_frame
        from dcf.geometry.transforms import project_velo_to_image
        cfg = tiny_config(with_fusion=True)
        fn = jax.jit(lambda p, m: project_velo_to_image(p[:, :3], m))
        for seed in (0, 4, 11):
            ex = frame_to_example(make_varied_frame(seed=seed), cfg)
            dev = fn(jnp.asarray(ex["points"]),
                     jnp.asarray(ex["velo_to_image"]))
            np.testing.assert_array_equal(ex["points_uvz"],
                                          np.asarray(dev))

    def test_host_row_cum_matches_device(self):
        """The host-shipped fusion_row_cum must equal the on-device
        fine_row_cum(fine_rows_for_fusion(...)) exactly (the device
        consumes whichever is present; they must be interchangeable)."""
        from dcf.data.synthetic import make_varied_frame
        from dcf.models.fusion import (fine_rows_for_fusion,
                                       fusion_row_cum_len)
        from dcf.ops.pallas.fusion_kernel import fine_row_cum
        cfg = tiny_config(with_fusion=True)
        L = fusion_row_cum_len(cfg)
        for seed in (0, 3, 9):
            ex = frame_to_example(make_varied_frame(seed=seed), cfg)
            host = ex["fusion_row_cum"]
            assert host.shape == (L,)
            fr = fine_rows_for_fusion(
                jnp.asarray(ex["points"])[None],
                jnp.asarray(ex["point_mask"])[None], cfg.voxel,
                min(cfg.backbone.fusion_strides))
            dev = fine_row_cum(fr[0], L - 1)
            np.testing.assert_array_equal(host, np.asarray(dev))


class TestStaticShapes:
    def test_jit_cache_one_entry_per_batch_shape(self, fusion_setup):
        """SURVEY.md 4.4 / VERDICT round-2 item 8: varied frames must NOT
        retrace — frame-to-frame variation (point count, object count,
        poses) is absorbed by padding/bucketing, so the jit cache holds
        exactly one executable per batch shape."""
        cfg, model, _, params = fusion_setup
        infer = jax.jit(make_inference_fn(cfg, model))
        pack = device_anchor_pack(cfg)
        from dcf.data.synthetic import make_varied_frame
        for seed in range(6):
            b = {k: jnp.asarray(v) for k, v in stack_examples(
                [frame_to_example(make_varied_frame(seed=seed), cfg)]
            ).items()}
            infer(params, b, pack).__class__   # execute
        assert infer._cache_size() == 1
        # a second batch shape adds exactly one more executable
        b2 = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(make_varied_frame(seed=7), cfg)] * 2
        ).items()}
        infer(params, b2, pack)
        assert infer._cache_size() == 2


class TestCapabilityConfigs:
    """One forward per BASELINE.json config milestone (1/2/3 shapes)."""

    def test_camera_branch_config(self):
        """Config 2: ResNet image backbone feature extraction wired in."""
        from dcf.config import tiny_config
        import dataclasses
        cfg = tiny_config(with_fusion=False)
        cfg = dataclasses.replace(cfg, with_camera=True)
        model = ContFuseDetector(cfg)
        batch = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(make_frame(seed=2), cfg)]).items()}
        params = jax.jit(model.init)(jax.random.key(0), batch)
        assert "image_backbone" in params["params"]
        preds = jax.jit(model.apply)(params, batch)
        assert np.isfinite(np.asarray(preds["cls"])).all()

    def test_single_scale_fusion_config(self):
        """Config 3: fusion at one scale only."""
        import dataclasses
        from dcf.config import tiny_config, BackboneConfig
        cfg = tiny_config(with_fusion=True)
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone,
                                              fusion_strides=(4,)))
        model = ContFuseDetector(cfg)
        batch = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(make_frame(seed=3), cfg)]).items()}
        params = jax.jit(model.init)(jax.random.key(0), batch)
        names = list(params["params"].keys())
        assert "fusion_s4" in names and "fusion_s2" not in names
        preds = jax.jit(model.apply)(params, batch)
        assert np.isfinite(np.asarray(preds["cls"])).all()


class TestExactTopK:
    def test_exact_topk_decode_matches_approx_on_cpu(self):
        """exact_topk flag: same decode contract; on CPU approx_max_k is
        exact anyway so outputs must be identical."""
        from dataclasses import replace
        from dcf.models.head import decode_and_nms, flatten_predictions
        from dcf.models.anchors import generate_anchors
        import numpy as np
        cfg = tiny_config(with_fusion=False)
        anchors, classes, *_ = generate_anchors(cfg)
        rng = np.random.default_rng(0)
        N = anchors.shape[0]
        flat = {"cls": jnp.asarray(rng.normal(-4, 2, (1, N)), jnp.float32),
                "reg": jnp.asarray(rng.normal(0, 0.1, (1, N, 7)),
                                   jnp.float32),
                "dir": jnp.asarray(rng.normal(0, 1, (1, N, 2)),
                                   jnp.float32)}
        a, c = jnp.asarray(anchors), jnp.asarray(classes)
        out_approx = decode_and_nms(flat, a, c, cfg)
        cfg_exact = replace(cfg, head=replace(cfg.head, exact_topk=True))
        out_exact = decode_and_nms(flat, a, c, cfg_exact)
        for key in ("boxes", "scores", "classes", "valid"):
            np.testing.assert_array_equal(np.asarray(out_approx[key]),
                                          np.asarray(out_exact[key]),
                                          err_msg=key)
