"""TPU profiling driver (dev tool; SURVEY.md aux subsystem 1).

Measures, on the real chip, the numbers the round backlog tracks:
  - e2e inference latency at batch sizes 1..8 (per-frame ms)
  - train step latency at batch 2 (and optional other sizes)
  - optional per-op tables (--ops) for inference / train step

Usage:  python scripts/profile_tpu.py [--ops] [--train-only|--infer-only]
        [--batches 1,2,4,8]

One TPU process at a time (tunneled backend).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_latency(step_once, fetch, n_small=4, n_big=16, repeats=3):
    """Per-execution seconds of a state-threading loop via chain slopes.

    step_once: state -> state (enqueues one execution)
    fetch: state -> small host value (completion barrier)
    """
    def chain(n):
        t0 = time.perf_counter()
        s = None
        for _ in range(n):
            s = step_once()
        fetch(s)
        return time.perf_counter() - t0

    chain(2)
    samples = []
    for _ in range(repeats):
        t_small = chain(n_small)
        t_big = chain(n_big)
        samples.append((t_big - t_small) / (n_big - n_small))
    return float(np.median(samples))


def build_batch(cfg, batch_size, varied=True):
    from dcf.data.preprocess import frame_to_example, stack_examples
    from dcf.data import synthetic
    mk = synthetic.make_varied_frame if varied else synthetic.make_frame
    ex = stack_examples([frame_to_example(mk(seed=i), cfg, seed=i)
                         for i in range(batch_size)])
    return {k: jnp.asarray(v) for k, v in ex.items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ops", action="store_true")
    p.add_argument("--train-only", action="store_true")
    p.add_argument("--infer-only", action="store_true")
    p.add_argument("--batches", default="1,2,4")
    p.add_argument("--train-batch", type=int, default=2)
    args = p.parse_args()

    from dcf.config import multi_scale_config, resolve_platform
    from dcf.eval.inference import make_inference_fn
    from dcf.models.anchors import anchor_pack
    from dcf.models.detector import ContFuseDetector
    from dcf.utils.profiling import device_latency, trace_op_table

    cfg = resolve_platform(multi_scale_config())
    model = ContFuseDetector(cfg)
    print("device:", jax.devices()[0])

    batch1 = build_batch(cfg, 1)
    params = jax.jit(model.init)(jax.random.key(0), batch1)
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}

    if not args.train_only:
        infer0 = make_inference_fn(cfg, model)
        for bs in [int(b) for b in args.batches.split(",")]:
            batch = build_batch(cfg, bs)
            fn = jax.jit(lambda p, b, k: infer0(p, b, k)["scores"].sum())
            sec = device_latency(fn, (params, batch, pack))
            print(f"infer  B={bs}: {sec * 1e3:8.3f} ms/batch  "
                  f"{sec * 1e3 / bs:8.3f} ms/frame  "
                  f"{bs / sec:7.1f} fps/chip")
            if args.ops and bs == 1:
                lowered = jax.jit(
                    lambda p, b, k: infer0(p, b, k)["scores"].sum()
                ).lower(params, batch, pack).compile()
                txt = lowered.as_text()
                table = trace_op_table(fn, (params, batch, pack),
                                       "/tmp/dcf_trace_infer",
                                       compiled_text=txt)
                print("--- top inference ops ---")
                for ms, op, name, src in table[:30]:
                    print(f"{ms:8.3f} ms  {op[:44]:44s} {src}")

    if not args.infer_only:
        from dcf.train.state import create_train_state
        from dcf.train.step import make_train_step
        bs = args.train_batch
        tbatch = build_batch(cfg, bs)
        tbatch["gt_boxes"] = jnp.asarray(
            np.tile(np.asarray(tbatch["gt_boxes"]), (1, 1, 1)))
        state = create_train_state(cfg, params)
        step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))

        state, metrics = step(state, tbatch, pack)
        float(metrics["loss"])                      # compile + settle

        holder = {"state": state}

        def step_once():
            s, m = step(holder["state"], tbatch, pack)
            holder["state"] = s
            return m

        sec = chain_latency(step_once,
                            lambda m: float(m["loss"]))
        print(f"train  B={bs}: {sec * 1e3:8.3f} ms/step  "
              f"{sec * 1e3 / bs:8.3f} ms/frame")
        if args.ops:
            lowered = jax.jit(
                make_train_step(cfg, model)).lower(
                    holder["state"], tbatch, pack).compile()
            txt = lowered.as_text()
            step2 = jax.jit(make_train_step(cfg, model))

            def fn(s, b, k):
                ns, m = step2(s, b, k)
                return m["loss"]

            table = trace_op_table(fn, (holder["state"], tbatch, pack),
                                   "/tmp/dcf_trace_train",
                                   compiled_text=txt)
            print("--- top train ops ---")
            for ms, op, name, src in table[:30]:
                print(f"{ms:8.3f} ms  {op[:44]:44s} {src}")


if __name__ == "__main__":
    main()
