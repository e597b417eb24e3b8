"""End-to-end torch-CPU oracle test (VERDICT round-2 item 4; SURVEY.md
4.2).

The full jitted forward (voxelize -> image backbone -> BEV stages with
interleaved continuous fusion -> FPN -> head) must match an independent
float64 torch reimplementation (tests/oracles/torch_detector.py) that
consumes the same flax params, to fp32 tolerance on a golden frame.
The JAX side runs with compute dtype float32 (the only bf16 left on the
CPU path would otherwise be the fusion img_proj) so the comparison
measures implementation parity, not dtype noise.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcf.config import tiny_config
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_frame
from dcf.models.detector import ContFuseDetector
from tests.oracles.torch_detector import torch_forward


def _setup(with_fusion: bool):
    cfg = tiny_config(with_fusion=with_fusion)
    cfg = replace(cfg, backbone=replace(cfg.backbone, dtype="float32"))
    model = ContFuseDetector(cfg)
    frame = make_frame(seed=0)
    batch_np = stack_examples([frame_to_example(frame, cfg)])
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = jax.jit(model.init)(jax.random.key(0), batch)
    preds = jax.device_get(jax.jit(model.apply)(params, batch))
    oracle = torch_forward(jax.device_get(params), batch_np, cfg)
    return preds, oracle


def _compare(preds, oracle, name):
    got = np.asarray(preds[name][0], np.float64)
    want = np.asarray(oracle[name])
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=2e-3,
                               err_msg=name)


class TestEndToEndOracle:
    def test_lidar_only_forward_matches_torch(self):
        preds, oracle = _setup(with_fusion=False)
        for name in ("cls", "reg", "dir"):
            _compare(preds, oracle, name)

    def test_full_fusion_forward_matches_torch(self):
        preds, oracle = _setup(with_fusion=True)
        for name in ("cls", "reg", "dir"):
            _compare(preds, oracle, name)
