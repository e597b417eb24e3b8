"""Shared Flax building blocks for both backbones (SURVEY.md M1/M2).

TPU conventions: NHWC layout, bfloat16 compute with float32 params
(BackboneConfig.dtype), GroupNorm instead of BatchNorm so the whole model is
a pure function of (params, inputs) — no mutable batch statistics to thread
through pjit/shard_map. Norm/softmax-style reductions run in float32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class _ConvKernel(nn.Module):
    """Bare conv-kernel param under the SAME variable path nn.Conv uses
    ("<name>/kernel"), so the int8 path shares float checkpoints."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


def _num_groups(channels: int) -> int:
    for g in (32, 16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


class ConvNorm(nn.Module):
    """Conv -> GroupNorm -> optional activation.

    `quant` enables the int8 PTQ serving path (SURVEY.md "speed-of-light
    on target hardware"; v5e's MXU doubles its rate at int8):
      - "off":   bf16 conv (training and the default serving path);
      - "calib": bf16 conv + record the running max-abs of the conv
                 input into the mutable "quant" collection
                 (dcf.quant.calibrate drives this);
      - "int8":  symmetric per-tensor activation / per-out-channel
                 weight quantization, int8 x int8 -> int32 conv, exact
                 dequant. Shares the float param structure (scales live
                 in the separate "quant" collection), so a bf16-trained
                 checkpoint serves quantized without conversion.
    GroupNorm stays bf16 in every mode.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    act: Optional[Callable] = nn.relu
    quant: str = "off"

    @nn.compact
    def __call__(self, x):
        if self.quant == "int8":
            x = self._int8_conv(x)
        else:
            if self.quant == "calib":
                amax = self.variable("quant", "in_amax",
                                     lambda: jnp.zeros((), jnp.float32))
                amax.value = jnp.maximum(
                    amax.value,
                    jnp.max(jnp.abs(x.astype(jnp.float32))))
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32)(x)
        # bf16 GroupNorm: flax accumulates the moments in fp32 internally,
        # and keeping the activation dtype avoids a full fp32 round-trip
        # (two 36 MB copies per norm at the finest BEV scale).
        # At batch > 1 XLA:TPU's conv+GroupNorm fusion is pathological
        # (measured 3.8x slower than the two ops apart at B=4 on v5e, the
        # round-1 "batching regresses throughput" mystery); an
        # optimization barrier keeps them separate. B is static, and at
        # B=1 the fusion is fine, so the barrier is batch-gated.
        if x.shape[0] > 1:
            x = jax.lax.optimization_barrier(x)
        x = nn.GroupNorm(num_groups=_num_groups(self.features),
                         dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.act is not None:
            x = self.act(x)
        return x

    def _int8_conv(self, x):
        """Symmetric int8 PTQ conv: per-tensor input scale (calibrated
        running max-abs), per-out-channel weight scales, int8 x int8 ->
        int32 on the MXU, exact dequant. Rounding is the only error."""
        k, cout = self.kernel, self.features
        w = _ConvKernel((k, k, x.shape[-1], cout), name="Conv_0")()
        amax = self.variable("quant", "in_amax",
                             lambda: jnp.zeros((), jnp.float32))
        s_x = jnp.maximum(amax.value, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                      -127, 127).astype(jnp.int8)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)),
                          1e-12) / 127.0                       # [cout]
        wq = jnp.clip(jnp.round(w / s_w), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            xq, wq, (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (s_x * s_w)).astype(self.dtype)


class BasicBlock(nn.Module):
    """ResNet-v1 basic block, NHWC.

    `entry_kernel` sizes the first conv only: a block consuming a
    space-to-depth(2) input uses kernel 2 / stride 1 — the same spatial
    taps as a 3x3/stride-2 conv on the pre-s2d tensor, MXU-friendly
    channel count (see dcf.data.voxelize.rasterize_bev_s2d)."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    quant: str = "off"
    entry_kernel: int = 3

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvNorm(self.features, self.entry_kernel, self.stride,
                     self.dtype, quant=self.quant)(x)
        y = ConvNorm(self.features, 3, 1, self.dtype, act=None,
                     quant=self.quant)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = ConvNorm(self.features, 1, self.stride, self.dtype,
                                act=None, quant=self.quant)(x)
        return nn.relu(y + residual)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample (NHWC)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
