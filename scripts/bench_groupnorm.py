"""Microbench: GroupNorm at B=1 vs B=4 on the chip (dev tool)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from dcf.utils.profiling import device_latency


def run(mod_name, make_mod, shape):
    mod = make_mod()
    x = jnp.zeros(shape, jnp.bfloat16)
    params = jax.jit(mod.init)(jax.random.key(0), x)
    fn = jax.jit(lambda p, v: mod.apply(p, v).astype(jnp.float32).sum())
    ms = device_latency(fn, (params, x)) * 1e3
    print(f"{mod_name:24s} {str(shape):24s} {ms:8.3f} ms")


class ManualGN(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        g = self.groups
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        xf = x.astype(jnp.float32).reshape(B, H * W, g, C // g)
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - \
            jnp.square(mean)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        y = y.reshape(B, H, W, C) * scale + bias
        return y.astype(x.dtype)


def main():
    for B in (1, 4):
        shape = (B, 352, 400, 64)
        run("flax GroupNorm32 bf16", lambda: nn.GroupNorm(
            num_groups=32, dtype=jnp.bfloat16, param_dtype=jnp.float32),
            shape)
        run("manual GN f32 stats", lambda: ManualGN(32), shape)
        run("conv+GN+relu", lambda: __import__(
            "dcf.models.layers", fromlist=["ConvNorm"]).ConvNorm(
                64, 3, 1), shape)


if __name__ == "__main__":
    main()
