"""End-to-end inference pipeline (SURVEY.md T4, call stack 3.2).

One jitted function: padded raw frame in -> final (boxes, scores, classes,
valid) out. Voxelization, both backbones, fusion, head, anchor decode and
rotated NMS all run on device — the host only does file IO and the KITTI
txt writer (BASELINE.json:5 "no host round-trips").
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from dcf.config import Config
from dcf.models.detector import ContFuseDetector
from dcf.models.head import decode_and_nms, flatten_predictions


def make_inference_fn(cfg: Config, model: ContFuseDetector
                      ) -> Callable[[Dict, Dict, Dict],
                                    Dict[str, jnp.ndarray]]:
    """Returns infer(params, batch, anchor_pack) -> detections dict.

    `anchor_pack` (see dcf.models.anchors.anchor_pack) is threaded as an
    explicit argument — closing over the anchor arrays would embed them as
    large constants, which the axon TPU runtime punishes process-wide.
    """

    def infer(params, batch, pack):
        preds = model.apply(params, batch)
        flat = flatten_predictions(preds, cfg)
        return decode_and_nms(flat, pack["boxes"], pack["classes"], cfg)

    return infer


def device_anchor_pack(cfg: Config) -> Dict[str, jnp.ndarray]:
    """Anchor arrays device-put once, for reuse across calls."""
    from dcf.models.anchors import anchor_pack
    return {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}


def make_jit_inference(cfg: Config, model: ContFuseDetector):
    return jax.jit(make_inference_fn(cfg, model))
