"""Chip task (VERDICT r4 items 3+5): time the B=2 train step with and
without fusion.z_slab_cap_max, then compile-check the flagship B=8
train step WITHOUT auto grad-accum.

The clamp bounds the fusion backward's per-slab [hid, capz] dz1 output
block and z1 slab scratch (s16: capz 12288 -> 8192 at cap_max=8192),
the scoped-VMEM driver of the B=8 OOM (BASELINE.md round-5 section).
slab_overflow is reported per variant so a biting clamp can't pass
silently.

Usage: python scripts/bench_train_clamp.py [--cap 8192] [--steps 30]
"""
import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def time_train_step(cfg, batch_size: int, steps: int):
    from dcf.data.preprocess import frame_to_example, stack_examples
    from dcf.data.synthetic import make_varied_frame
    from dcf.models.anchors import anchor_pack
    from dcf.models.detector import ContFuseDetector
    from dcf.train.state import create_train_state
    from dcf.train.step import make_train_step

    model = ContFuseDetector(cfg)
    exs = [frame_to_example(make_varied_frame(seed=i), cfg, seed=i)
           for i in range(batch_size)]
    batch = {k: jnp.asarray(v) for k, v in stack_examples(exs).items()}
    params = jax.jit(model.init)(jax.random.key(0),
                                 {k: v[:1] for k, v in batch.items()})
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    state = create_train_state(cfg, params)
    step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
    t0 = time.perf_counter()
    state, m = step(state, batch, pack)
    jax.block_until_ready(m["loss"])
    compile_s = time.perf_counter() - t0
    # timed loop (donated state chains the steps)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, pack)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / steps * 1e3
    return dt, compile_s, {k: float(v) for k, v in m.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cap", type=int, default=8192)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--skip-b8", action="store_true")
    args = p.parse_args()
    from dcf.config import multi_scale_config, resolve_platform

    base = resolve_platform(multi_scale_config())
    for tag, cfg in (
            ("baseline", base),
            (f"cap{args.cap}", dataclasses.replace(
                base, fusion=dataclasses.replace(
                    base.fusion, z_slab_cap_max=args.cap)))):
        dt, cs, m = time_train_step(cfg, base.train.batch_size, args.steps)
        print(f"[B={base.train.batch_size}] {tag}: {dt:.2f} ms/step "
              f"(compile {cs:.0f}s) loss={m['loss']:.4f} "
              f"slab_overflow={m.get('slab_overflow', 0):.0f}", flush=True)

    if not args.skip_b8:
        cfg8 = dataclasses.replace(
            base,
            train=dataclasses.replace(base.train, batch_size=8,
                                      micro_batch_max=None),
            fusion=dataclasses.replace(base.fusion,
                                       z_slab_cap_max=args.cap))
        try:
            dt, cs, m = time_train_step(cfg8, 8, max(args.steps // 4, 5))
            print(f"[B=8 cap{args.cap} NO auto_accum] {dt:.2f} ms/step "
                  f"(compile {cs:.0f}s) loss={m['loss']:.4f} "
                  f"slab_overflow={m.get('slab_overflow', 0):.0f}",
                  flush=True)
        except Exception as e:  # OOM prints, doesn't kill the probe
            print(f"[B=8 cap{args.cap} NO auto_accum] FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
