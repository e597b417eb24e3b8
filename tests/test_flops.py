"""Analytic FLOP accounting tests (VERDICT round-2 item 1).

The MFU denominator must be trustworthy: the analytic per-frame model
FLOPs (dcf.utils.flops, computed from the Config alone) are validated
against XLA's own cost analysis of the compiled forward. Analytic counts
matmul/conv math only, so it must land slightly BELOW XLA's count (which
adds elementwise ops) but never far below: measured ratios are ~0.95 on
the full config and ~0.80 on the tiny test config (relatively more
elementwise overhead at small channel counts).
"""

import jax
import jax.numpy as jnp
import pytest

from dcf.config import multi_scale_config, resolve_platform, tiny_config
from dcf.utils import flops as F


class TestConvFormula:
    def test_single_conv_matches_hand_count(self):
        # 2 * H * W * Cin * Cout * k * k
        assert F._conv_flops(10, 20, 3, 8, 3) == 2 * 10 * 20 * 3 * 8 * 9

    def test_basic_block_projection_counted_only_when_needed(self):
        same = F._basic_block_flops(8, 8, 16, 16, 1)
        proj = F._basic_block_flops(8, 8, 16, 16, 2)
        assert proj == same + F._conv_flops(8, 8, 16, 16, 1)


class TestAgainstXLA:
    def test_tiny_config_within_band_of_xla_count(self):
        from dcf.data.preprocess import frame_to_example, stack_examples
        from dcf.data.synthetic import make_frame
        from dcf.models.detector import ContFuseDetector
        cfg = tiny_config(with_fusion=True)
        analytic = F.inference_flops_per_frame(cfg)["total"]
        model = ContFuseDetector(cfg)
        batch = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(make_frame(seed=0), cfg)]).items()}
        params = jax.eval_shape(model.init, jax.random.key(0), batch)
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
        comp = jax.jit(model.apply).lower(params, batch).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        xla = ca.get("flops")
        if not xla:
            pytest.skip("backend reports no cost analysis flops")
        assert 0.65 <= analytic / xla <= 1.02, (analytic, xla)


class TestFullConfig:
    def test_flagship_breakdown_sane(self):
        cfg = resolve_platform(multi_scale_config(), "cpu")
        parts = F.inference_flops_per_frame(cfg)
        # full config measured: ~177 GFLOP/frame, conv-dominated
        assert 150e9 < parts["total"] < 220e9
        assert parts["bev_backbone"] > parts["image_backbone"]
        assert parts["fusion"] < 0.1 * parts["total"]
        assert F.train_flops_per_frame(cfg) == 3 * parts["total"]

    def test_camera_and_fusion_gating(self):
        cfg = resolve_platform(multi_scale_config(), "cpu")
        lidar_only = F.inference_flops_per_frame(
            cfg.__class__(**{**cfg.__dict__, "with_camera": False,
                             "with_fusion": False}))
        assert "image_backbone" not in lidar_only
        assert "fusion" not in lidar_only

    def test_mfu_helper(self):
        ach, frac = F.mfu(100e9, 50.0)   # 100 GFLOP at 50 fps = 5 TFLOP/s
        assert ach == pytest.approx(5.0)
        assert frac == pytest.approx(5e12 / F.V5E_PEAK_BF16_FLOPS)
