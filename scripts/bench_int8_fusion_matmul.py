"""Microbench: int8 x int8 one-hot selection matmuls inside a Pallas
kernel vs the production bf16 ones (VERDICT r3 item 5).

The fusion kernel's dominant FLOPs are the per-row one-hot selections
(`fusion_kernel.py` _fwd_kernel): slab_r [HID, CAPR] x oh [CAPR, W] per
(row, k). The one-hot operand is exactly representable in int8; z1 would
need one calibrated scale (max-abs, like dcf.quant). If Mosaic lowers
int8 dot_general to the 394-TOPS MXU path, the kernel's matmul time
halves; if it upcasts (parity or worse), the idea stays parked like the
XLA int8 convs (BASELINE.md round-3 row).

Isolates exactly the matmul: one kernel per dtype runs the K x TH
selection loop over VMEM-resident operands at the flagship s2 shapes.
"""
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dcf.utils.profiling import device_latency

# flagship s2 fusion shapes: HID=64, capr=512, W=400, K=4, TH=8 rows/program
HID, CAPR, W, K, TH = 64, 512, 400, 4, 8
REPS = 4   # selection loops per program, to swamp launch overhead


def _kernel(slab_ref, oh_ref, out_ref, *, in_dtype, acc_dtype):
    # every (rep, rr, k) product must differ or the compiler CSEs the
    # matmuls away (first version measured an impossible 1500 TF/s):
    # scale the slab by a distinct scalar per iteration (one cheap VPU
    # broadcast next to each MXU matmul)
    acc = jnp.zeros((HID, W), jnp.float32)
    i = 1
    for _ in range(REPS):
        for rr in range(TH):
            for k in range(K):
                s = (slab_ref[...].astype(jnp.int32) * i
                     if in_dtype == jnp.int8
                     else slab_ref[...] * jnp.asarray(i, in_dtype))
                z1sel = jax.lax.dot_general(
                    s.astype(in_dtype), oh_ref[k],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dtype)
                acc = acc + z1sel.astype(jnp.float32)
                i += 1
    out_ref[...] = acc


def run(in_dtype, acc_dtype, n_programs=64):
    key = jax.random.key(0)
    slab = (jax.random.normal(key, (HID, CAPR)) * 8).astype(in_dtype)
    oh = (jax.random.uniform(key, (K, CAPR, W)) < (1.0 / CAPR)
          ).astype(in_dtype)
    kernel = functools.partial(_kernel, in_dtype=in_dtype,
                               acc_dtype=acc_dtype)
    fn = pl.pallas_call(
        kernel,
        grid=(n_programs,),
        in_specs=[pl.BlockSpec((HID, CAPR), lambda i: (0, 0)),
                  pl.BlockSpec((K, CAPR, W), lambda i: (0, 0, 0))],
        out_specs=pl.BlockSpec((HID, W), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((HID, W), jnp.float32),
    )
    f = jax.jit(lambda a, b: fn(a, b).sum())
    ms = device_latency(f, (slab, oh)) * 1e3
    flops = 2 * HID * CAPR * W * K * TH * REPS * n_programs
    return ms, flops / ms / 1e9


def main():
    ms_bf, tf_bf = run(jnp.bfloat16, jnp.float32)
    print(f"bf16 x bf16 -> f32 : {ms_bf:7.3f} ms  ({tf_bf:6.1f} TF/s)",
          flush=True)
    try:
        ms_i8, tops = run(jnp.int8, jnp.int32)
        print(f"int8 x int8 -> i32 : {ms_i8:7.3f} ms  ({tops:6.1f} TOP/s)"
              f"  speedup {ms_bf / ms_i8:4.2f}x", flush=True)
    except Exception as e:  # Mosaic may reject int8 dot_general outright
        print(f"int8 kernel failed to compile/run: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
