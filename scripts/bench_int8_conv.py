"""Microbench: does XLA:TPU lower int8 convs to the double-rate MXU path?

v5e peak is 197 TFLOP/s bf16 / 394 TOPS int8. If an int8 x int8 -> int32
conv measures ~2x the bf16 conv, an int8 PTQ serving mode is worth
building (NOTES_ROUND4.md item 2); if XLA upcasts (same or worse time),
it is not. Representative shapes = the flagship's heaviest conv layers.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dcf.utils.profiling import device_latency

SHAPES = [
    # (B, H, W, Cin, Cout, k) -- flagship hot convs
    (1, 352, 400, 64, 64, 3),
    (1, 176, 200, 128, 128, 3),
    (1, 88, 100, 192, 192, 3),
    (8, 176, 200, 128, 128, 3),
]


def conv(x, w, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def main():
    for B, H, W, Cin, Cout, k in SHAPES:
        key = jax.random.key(0)
        xf = jax.random.normal(key, (B, H, W, Cin), jnp.bfloat16)
        wf = jax.random.normal(key, (k, k, Cin, Cout), jnp.bfloat16)
        xi = (xf * 10).astype(jnp.int8)
        wi = (wf * 10).astype(jnp.int8)

        f_bf16 = jax.jit(lambda x, w: conv(x, w, jnp.float32)
                         .astype(jnp.float32).sum())
        f_int8 = jax.jit(lambda x, w: conv(x, w, jnp.int32)
                         .astype(jnp.float32).sum())
        ms_b = device_latency(f_bf16, (xf, wf)) * 1e3
        ms_i = device_latency(f_int8, (xi, wi)) * 1e3
        gflop = 2 * B * H * W * Cin * Cout * k * k / 1e9
        print(f"B{B} {H}x{W} {Cin}->{Cout} k{k}: bf16 {ms_b:7.3f} ms "
              f"({gflop/ms_b:6.1f} TF/s)  int8 {ms_i:7.3f} ms "
              f"({gflop/ms_i:6.1f} TOP/s)  speedup {ms_b/ms_i:4.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
