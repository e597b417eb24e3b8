"""BEV top-down FPN (SURVEY.md M2).

The BEV encoder stages themselves live in dcf.models.detector (they are
interleaved with the continuous-fusion layers, paper fig. 3); this module
merges the resulting multi-scale feature maps down to the detection-head
stride. NHWC, bf16 compute / fp32 params, compiled by XLA onto the MXU.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from dcf.config import BackboneConfig
from dcf.models.layers import ConvNorm, upsample2x


class BEVFPN(nn.Module):
    """Top-down merge of the multi-scale BEV features to head_stride."""

    cfg: BackboneConfig

    @nn.compact
    def __call__(self, feats: Dict[int, jnp.ndarray]) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        strides = sorted(feats.keys())
        top = max(strides)
        y = ConvNorm(cfg.fpn_channels, 1, 1, dtype, act=None,
                     quant=cfg.quant_mode)(feats[top])
        stride = top
        while stride > cfg.head_stride:
            stride //= 2
            y = upsample2x(y)
            lateral = ConvNorm(cfg.fpn_channels, 1, 1, dtype, act=None,
                               quant=cfg.quant_mode)(feats[stride])
            y = y + lateral
        y = ConvNorm(cfg.fpn_channels, 3, 1, dtype,
                     quant=cfg.quant_mode)(y)
        return y
