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
        """image: [B, H, W, 3] float32 in [0, 1] (H, W multiples of 4),
        OR already space-to-depth(4)'d [B, H/4, W/4, 48] (the host
        prefetch path, `dcf.data.preprocess.s2d_image`)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = image.astype(dtype)
        # Patchify stem (ConvNeXt-style): space-to-depth(4) + 1x1 ConvNorm
        # == one 4x4/stride-4 conv. Replaces 7x7/s2 conv + 3x3/s2 maxpool:
        # a 7x7 conv over 3 input channels cannot tile onto the MXU (XLA
        # lowers it as multiply+reduce -- 1.11 ms at B=1 on v5e, ~1% of
        # peak) while the 48-channel 1x1 on the s2d'd image is a pure
        # matmul. The ImageNet mean/std normalize is dropped: training is
        # from scratch and GroupNorm follows immediately, so the input
        # affine was redundant (and its div materialized a 0.47 ms copy).
        # The s2d itself is done on the HOST by default
        # (ImageConfig.host_s2d: the in-graph reshape + transpose
        # materialized 0.38 ms of copies at B=1 on v5e); the raw-layout
        # branch below keeps hand-built [B, H, W, 3] batches working.
        B, H, W, C = x.shape
        if C == 3:
            assert H % 4 == 0 and W % 4 == 0, (H, W)
            x = x.reshape(B, H // 4, 4, W // 4, 4, C)
            x = x.transpose((0, 1, 3, 2, 4, 5)).reshape(B, H // 4, W // 4,
                                                        16 * C)
        else:
            assert C == 48, C
        x = ConvNorm(cfg.image_stage_channels[0], 1, 1, dtype,
                     quant=cfg.quant_mode)(x)

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
