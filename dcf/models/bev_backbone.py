"""BEV conv backbone + top-down FPN (SURVEY.md M2).

Takes the rasterized pseudo-image and produces (a) one feature map per
fusion stride for the continuous-fusion layers to inject camera features
into, and (b) a merged FPN map at the detection-head stride.

The reference's BEV stream is a plain torch conv stack; here it is a Flax
module compiled by XLA onto the MXU (NHWC, bf16 compute / fp32 params).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dcf.config import BackboneConfig
from dcf.models.layers import BasicBlock, ConvNorm, upsample2x


class BEVBackbone(nn.Module):
    """Residual BEV encoder producing feature maps at strides 2/4/8/16."""

    cfg: BackboneConfig

    @nn.compact
    def __call__(self, pseudo_image: jnp.ndarray) -> Dict[int, jnp.ndarray]:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = pseudo_image.astype(dtype)
        x = ConvNorm(cfg.bev_stem_channels, 3, 1, dtype)(x)
        feats: Dict[int, jnp.ndarray] = {}
        stride = 1
        for stage, channels in enumerate(cfg.bev_stage_channels):
            x = BasicBlock(channels, stride=2, dtype=dtype)(x)
            for _ in range(cfg.bev_blocks_per_stage[stage] - 1):
                x = BasicBlock(channels, stride=1, dtype=dtype)(x)
            stride *= 2
            feats[stride] = x
        return feats


class BEVFPN(nn.Module):
    """Top-down merge of the multi-scale BEV features to head_stride."""

    cfg: BackboneConfig

    @nn.compact
    def __call__(self, feats: Dict[int, jnp.ndarray]) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        strides = sorted(feats.keys())
        top = max(strides)
        y = ConvNorm(cfg.fpn_channels, 1, 1, dtype, act=None)(feats[top])
        stride = top
        while stride > cfg.head_stride:
            stride //= 2
            y = upsample2x(y)
            lateral = ConvNorm(cfg.fpn_channels, 1, 1, dtype,
                               act=None)(feats[stride])
            y = y + lateral
        y = ConvNorm(cfg.fpn_channels, 3, 1, dtype)(y)
        return y
