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


def _num_groups(channels: int) -> int:
    for g in (32, 16, 8, 4, 2, 1):
        if channels % g == 0:
            return g
    return 1


class ConvNorm(nn.Module):
    """Conv -> GroupNorm -> optional activation."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Dtype = jnp.bfloat16
    act: Optional[Callable] = nn.relu

    @nn.compact
    def __call__(self, x):
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


class BasicBlock(nn.Module):
    """ResNet-v1 basic block, NHWC."""

    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvNorm(self.features, 3, self.stride, self.dtype)(x)
        y = ConvNorm(self.features, 3, 1, self.dtype, act=None)(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = ConvNorm(self.features, 1, self.stride, self.dtype,
                                act=None)(x)
        return nn.relu(y + residual)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample (NHWC)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
