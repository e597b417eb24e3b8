"""Image-stream ResNet backbone (SURVEY.md M1).

Own Flax implementation (no torchvision port): ResNet-18-shaped by default
(BackboneConfig.image_blocks_per_stage / image_stage_channels), returning
the multi-scale feature pyramid at image strides 4/8/16/32 that the
continuous-fusion layers bilinearly sample from (paper section 3.2).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from dcf.config import BackboneConfig
from dcf.models.layers import BasicBlock, ConvNorm


class ImageBackbone(nn.Module):
    """ResNet-style encoder over the RGB image, NHWC, returns {stride: feat}."""

    cfg: BackboneConfig

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        """image: [B, H, W, 3] float32 in [0, 1]."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = image.astype(dtype)
        # normalize with ImageNet-ish statistics
        mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], dtype)
        x = (x - mean) / std

        x = ConvNorm(cfg.image_stage_channels[0], 7, 2, dtype,
                     quant=cfg.quant_mode)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        feats: Dict[int, jnp.ndarray] = {}
        stride = 4
        for stage, channels in enumerate(cfg.image_stage_channels):
            first_stride = 1 if stage == 0 else 2
            x = BasicBlock(channels, stride=first_stride, dtype=dtype,
                           quant=cfg.quant_mode)(x)
            for _ in range(cfg.image_blocks_per_stage[stage] - 1):
                x = BasicBlock(channels, stride=1, dtype=dtype,
                               quant=cfg.quant_mode)(x)
            if stage > 0:
                stride *= 2
            feats[stride] = x
        return feats
