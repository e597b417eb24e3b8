"""Benchmark harness (BASELINE.md protocol; SURVEY.md section 6).

Measures the flagship model's jitted end-to-end path (voxelize ->
backbones -> multi-scale continuous fusion -> head -> decode -> rotated
NMS) per the BASELINE.json metric: frames/sec/chip + p50 latency.

Protocol (BASELINE.md section 2):
  - latency distribution over a pool of seed-varied synthetic frames
    (object count/class/pose and point count 4k-18k drawn per seed),
    batch 1, full KITTI-resolution grid: p50/p95 across frames + mean
    over 500 executions cycling the pool;
  - frames/sec/chip at batch 1 and at the best batch of {2, 4, 8};
  - the training-step time (full config, batch 2).

Measurement method: on this environment's tunneled TPU backend,
`jax.block_until_ready` returns at *enqueue* time and any host fetch pays
a ~25 ms RPC round-trip, so single-call wall-clock timing is meaningless.
Instead N executions are enqueued back-to-back (the device runs them in
order) and the final result is fetched once; per-execution time is the
slope (T(N_big) - T(N_small)) / (N_big - N_small), which cancels both the
round-trip and the enqueue overhead. Per-frame executions are
data-independent in shape (static shapes), so frame-to-frame variation
comes from gather/scatter access patterns only.

Prints ONE JSON line:
  {"metric": ..., "value": p50_ms, "unit": "ms", "vs_baseline": ...,
   "p95_ms": ..., "mean_ms_500": ..., "frames_per_sec_per_chip": ...,
   "best_batch": ..., "fps_best_batch": ..., "train_step_ms_b2": ...}

vs_baseline: the reference repo's own latency is unmeasurable here (its
checkout is empty -- BASELINE.md); the stand-in baseline is the ContFuse
paper's reported ~60 ms/frame (2018 GPU), so vs_baseline = 60 / p50.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

PAPER_BASELINE_MS = 60.0
POOL = 64                 # distinct varied frames resident on device
MEAN_EXECS = 500          # executions for the cycling-pool mean
PER_FRAME_SAMPLES = 24    # frames measured individually for p50/p95


def _chain_time(fn, args_list, n) -> float:
    """Enqueue n executions cycling args_list; fetch once; total seconds."""
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(*args_list[i % len(args_list)])
    float(out)                            # fetch once: waits for all
    return time.perf_counter() - t0


def _slope_ms(fn, args_list, n_small=4, n_big=24, repeats=3) -> float:
    samples = []
    for _ in range(repeats):
        t_small = _chain_time(fn, args_list, n_small)
        t_big = _chain_time(fn, args_list, n_big)
        samples.append((t_big - t_small) / (n_big - n_small) * 1000.0)
    return float(np.median(samples))


def main() -> None:
    from dcf.config import multi_scale_config, resolve_platform
    from dcf.data.preprocess import frame_to_example, stack_examples
    from dcf.data.synthetic import make_varied_frame
    from dcf.eval.inference import make_inference_fn
    from dcf.models.anchors import anchor_pack
    from dcf.models.detector import ContFuseDetector
    from dcf.train.state import create_train_state
    from dcf.train.step import make_train_step

    cfg = resolve_platform(multi_scale_config())
    model = ContFuseDetector(cfg)
    examples = [frame_to_example(make_varied_frame(seed=i), cfg, seed=i)
                for i in range(POOL)]
    batches1 = [{k: jnp.asarray(v) for k, v in
                 stack_examples([e]).items()} for e in examples]
    params = jax.jit(model.init)(jax.random.key(0), batches1[0])
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    infer0 = make_inference_fn(cfg, model)
    # scalar summary output keeps the final fetch to one small transfer
    infer = jax.jit(lambda p, b, k: infer0(p, b, k)["scores"].sum())

    args1 = [(params, b, pack) for b in batches1]
    float(infer(*args1[0]))               # compile + settle
    _chain_time(infer, args1, 2)          # warm the dispatch path

    # --- batch-1: mean over MEAN_EXECS cycling the pool -------------------
    mean_small = _chain_time(infer, args1, 32)
    mean_big = _chain_time(infer, args1, MEAN_EXECS + 32)
    mean_ms = (mean_big - mean_small) / MEAN_EXECS * 1000.0

    # --- batch-1: per-frame latency distribution --------------------------
    per_frame = [
        _slope_ms(infer, [args1[i]], n_small=3, n_big=13, repeats=2)
        for i in range(PER_FRAME_SAMPLES)]
    p50 = float(np.percentile(per_frame, 50))
    p95 = float(np.percentile(per_frame, 95))
    fps_b1 = 1000.0 / mean_ms

    # --- best batch of {2, 4, 8} ------------------------------------------
    best_batch, best_fps = 1, fps_b1
    for bsz in (2, 4, 8):
        stacked = [
            {k: jnp.asarray(v) for k, v in stack_examples(
                [examples[(i * bsz + j) % POOL] for j in range(bsz)]
            ).items()}
            for i in range(max(POOL // bsz, 1))]
        argsb = [(params, b, pack) for b in stacked]
        float(infer(*argsb[0]))           # compile this batch shape
        per_exec_ms = _slope_ms(infer, argsb, n_small=3,
                                n_big=max(24 // bsz, 9), repeats=3)
        fps = 1000.0 / per_exec_ms * bsz
        if fps > best_fps:
            best_batch, best_fps = bsz, fps

    # --- train step, batch 2 (full config) ---------------------------------
    train_batch = {k: jnp.asarray(v) for k, v in
                   stack_examples(examples[:2]).items()}
    state = create_train_state(cfg, params)
    step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))

    def chain_train(n: int) -> float:
        nonlocal state
        t0 = time.perf_counter()
        metrics = None
        for _ in range(n):                # state threading chains on device
            state, metrics = step(state, train_batch, pack)
        float(metrics["loss"])
        return time.perf_counter() - t0

    chain_train(1)                        # compile
    chain_train(2)
    t_small = chain_train(3)
    t_big = chain_train(13)
    train_ms = (t_big - t_small) / 10 * 1000.0

    # --- MFU / roofline accounting (VERDICT round-2 item 1) ----------------
    # Analytic model FLOPs from the Config (dcf.utils.flops; validated at
    # ~95% of XLA's own cost analysis of the compiled forward -- the gap
    # is elementwise ops the accounting deliberately excludes). MFU uses
    # useful model FLOPs only: kernel-implementation overhead (one-hot
    # selection matmuls, KNN cascade) depresses MFU, as it should.
    from dcf.utils.flops import (V5E_HBM_BYTES_PER_S, V5E_PEAK_BF16_FLOPS,
                                 inference_bytes_per_frame,
                                 inference_flops_per_frame, mfu,
                                 train_flops_per_frame)
    fpf = inference_flops_per_frame(cfg)["total"]
    bpf = inference_bytes_per_frame(cfg)
    mem_bound_ms = bpf / V5E_HBM_BYTES_PER_S * 1e3
    compute_bound_ms = fpf / V5E_PEAK_BF16_FLOPS * 1e3
    ach_b1, mfu_b1 = mfu(fpf, fps_b1)
    ach_best, mfu_best = mfu(fpf, best_fps)
    train_fpf = train_flops_per_frame(cfg)
    ach_train, mfu_train = mfu(train_fpf, 2 * 1000.0 / train_ms)

    print(json.dumps({
        "metric": ("KITTI-res e2e DEVICE-ONLY latency p50 over seed-varied "
                   "synthetic frames (execution-chain measured), flagship "
                   "multi-scale fusion model, batch 1 (baseline = ContFuse "
                   "paper ~60 ms/frame, 2018 GPU; reference repo "
                   "unmeasurable -- empty checkout; host preprocessing "
                   "measured separately: 6.9 ms/frame single-thread, "
                   "~95 fps sustained at 4 workers -- BASELINE.md "
                   "round-5 host budget)"),
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(PAPER_BASELINE_MS / p50, 2),
        "p95_ms": round(p95, 3),
        "mean_ms_500": round(mean_ms, 3),
        "frames_per_sec_per_chip": round(fps_b1, 1),
        "best_batch": best_batch,
        "fps_best_batch": round(best_fps, 1),
        "train_step_ms_b2": round(train_ms, 3),
        "flops_per_frame_g": round(fpf / 1e9, 2),
        "achieved_tflops_b1": round(ach_b1, 2),
        "mfu_b1": round(mfu_b1, 4),
        "achieved_tflops_best_batch": round(ach_best, 2),
        "mfu_best_batch": round(mfu_best, 4),
        "train_flops_per_frame_g": round(train_fpf / 1e9, 2),
        "achieved_tflops_train": round(ach_train, 2),
        "mfu_train": round(mfu_train, 4),
        "peak_tflops_bf16": round(V5E_PEAK_BF16_FLOPS / 1e12, 1),
        # roofline: estimated HBM traffic / peak-BW memory floor and
        # peak-MXU compute floor per frame (dcf.utils.flops conventions)
        "hbm_bytes_per_frame_mb": round(bpf / 1e6, 1),
        "memory_bound_ms": round(mem_bound_ms, 2),
        "compute_bound_ms": round(compute_bound_ms, 2),
        "x_over_roofline_b1": round(
            p50 / max(mem_bound_ms, compute_bound_ms), 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
