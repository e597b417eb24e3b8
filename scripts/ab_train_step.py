"""Train-step A/B driver (dev tool): measure the full jitted train step
under config variants, plus a loss-layout microbench.

Usage: python scripts/ab_train_step.py [variant ...]
  variants: base, win32, onepass, or all (default: all)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp

from dcf.config import multi_scale_config, resolve_platform
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_varied_frame
from dcf.models.anchors import anchor_pack
from dcf.models.detector import ContFuseDetector
from dcf.train.state import create_train_state
from dcf.train.step import make_train_step
from dcf.utils.profiling import device_latency


def step_ms(cfg, batch):
    model = ContFuseDetector(cfg)
    params = jax.jit(model.init)(jax.random.key(0),
                                 {k: v[:1] for k, v in batch.items()})
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    state = create_train_state(cfg, params)
    step = jax.jit(make_train_step(cfg, model))

    def fn(s):
        s2, m = step(s, batch, pack)
        return m["loss"]

    return device_latency(fn, (state,)) * 1000.0


def loss_layout_bench():
    """[B,N,7] (minor-dim-7 padded tiles) vs [B,7,N] elementwise chain."""
    B, N = 2, 422400
    k = jax.random.key(0)
    for shape, axis in (((B, N, 7), -1), ((B, 7, N), 1)):
        pred = jax.random.normal(k, shape, jnp.float32)
        tgt = jax.random.normal(jax.random.key(1), shape, jnp.float32)
        w = jnp.ones((B, N), jnp.float32)

        def loss(p, t):
            d = jnp.abs(p - t)
            e = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)
            return jnp.sum(jnp.sum(e, axis=axis) * w)

        g = jax.jit(lambda p, t: jax.grad(loss)(p, t).sum())
        ms = device_latency(lambda p: g(p, tgt), (pred,)) * 1000.0
        print(f"loss layout {shape}: {ms:.3f} ms (grad incl.)")


def main():
    variants = sys.argv[1:] or ["all"]
    if "loss" in variants or "all" in variants:
        loss_layout_bench()
    base = resolve_platform(multi_scale_config())
    exs = [frame_to_example(make_varied_frame(seed=i), base, seed=i)
           for i in range(2)]
    batch = {k: jnp.asarray(v) for k, v in stack_examples(exs).items()}
    runs = {
        "base": base,
        "win32": dataclasses.replace(
            base, train=dataclasses.replace(base.train, assigner_window=32)),
        "onepass": dataclasses.replace(
            base, fusion=dataclasses.replace(base.fusion, cascade="onepass",
                                             cascade_slot_group=2)),
    }
    for name, cfg in runs.items():
        if name in variants or "all" in variants:
            print(f"{name}: {step_ms(cfg, batch):.2f} ms")


if __name__ == "__main__":
    main()
