"""Inference op budget: decompose the B=1 e2e latency into named buckets
(dev tool; VERDICT r3 item 1).

Runs the flagship inference function once under jax.profiler, aggregates
EVERY device op from the Chrome trace, and buckets them by HLO source
attribution + op-name patterns into the pipeline stages:

    image-backbone | bev-backbone+fpn | fusion-kernels | binning+windows
    | bilinear+img_proj | voxelize | head | decode+nms | relayout-copies
    | other

Prints the bucket table (ms, % of op-sum) plus the chained e2e p50 for
cross-checking, and the full top-40 op rows underneath for drill-down.

Usage:  python scripts/profile_infer_budget.py [--batch 1] [--json out]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import json
import re

import jax
import jax.numpy as jnp


# op_name metadata carries the Flax module path
# (e.g. ".../bev_stage0_block0/Conv_0/conv_general_dilated") -- the most
# reliable attribution; source file is the fallback.
NAME_RULES = [
    ("fusion-kernels", r"fusion_s\d+"),
    ("image-backbone", r"image_backbone"),
    ("bev-backbone", r"bev_stage"),
    ("fpn", r"/fpn/"),
    ("head", r"/head/"),
]

BUCKET_RULES = [
    # (bucket, source-substring or op-name regex)
    ("fusion-kernels", r"fusion_kernel\.py"),
    ("clip-kernel", r"clip_kernel\.py"),
    ("image-backbone", r"resnet\.py"),
    ("bev-backbone", r"bev_backbone\.py"),
    ("bev-backbone", r"detector\.py"),
    ("head", r"head\.py"),
    ("decode+nms", r"nms\.py"),
    ("decode+nms", r"boxes\.py"),
    ("binning+windows", r"knn\.py"),
    ("bilinear+img_proj", r"bilinear\.py"),
    ("bilinear+img_proj", r"transforms\.py"),
    ("voxelize", r"voxelize\.py"),
    ("fusion-glue", r"fusion\.py"),
    ("layers", r"layers\.py"),
]

OPNAME_RULES = [
    ("relayout-copies", r"^(copy|bitcast|transpose|copy-start|copy-done)"),
    ("infeed/outfeed", r"(infeed|outfeed)"),
]


def bucket_of(op: str, name: str, src: str) -> str:
    for b, pat in NAME_RULES:
        if re.search(pat, name):
            return b
    for b, pat in BUCKET_RULES:
        if re.search(pat, src):
            return b
    for b, pat in OPNAME_RULES:
        if re.search(pat, op):
            return b
    # conv ops without source attribution: split by shape heuristics later
    if "conv" in op or "cudnn" in op:
        return "conv-unattributed"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--json", default="")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    from dcf.config import multi_scale_config, resolve_platform
    from dcf.data.preprocess import frame_to_example, stack_examples
    from dcf.data.synthetic import make_varied_frame
    from dcf.eval.inference import make_inference_fn
    from dcf.models.anchors import anchor_pack
    from dcf.models.detector import ContFuseDetector
    from dcf.utils.profiling import device_latency, trace_op_table

    def build_batch(cfg, bs):
        ex = stack_examples([frame_to_example(make_varied_frame(seed=i),
                                              cfg, seed=i)
                             for i in range(bs)])
        return {k: jnp.asarray(v) for k, v in ex.items()}

    cfg = resolve_platform(multi_scale_config())
    model = ContFuseDetector(cfg)
    print("device:", jax.devices()[0])

    batch = build_batch(cfg, args.batch)
    params = jax.jit(model.init)(jax.random.key(0), batch)
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    infer0 = make_inference_fn(cfg, model)
    fn = jax.jit(lambda p, b, k: infer0(p, b, k)["scores"].sum())

    sec = device_latency(fn, (params, batch, pack))
    print(f"e2e chained: {sec * 1e3:.3f} ms/batch "
          f"({sec * 1e3 / args.batch:.3f} ms/frame)")

    lowered = jax.jit(
        lambda p, b, k: infer0(p, b, k)["scores"].sum()
    ).lower(params, batch, pack).compile()
    txt = lowered.as_text()
    table = trace_op_table(fn, (params, batch, pack),
                           "/tmp/dcf_trace_budget", top_k=100000,
                           compiled_text=txt)

    buckets = collections.Counter()
    rows = []
    for ms, op, name, src in table:
        if "jit" in op or op == "0":     # whole-execution wrapper events
            continue
        b = bucket_of(op, name, src)
        buckets[b] += ms
        rows.append((ms, op, name, src, b))
    op_sum = sum(buckets.values())

    print(f"\n--- bucket table (op-sum {op_sum:.3f} ms; "
          f"gaps/overlap vs chained: {sec * 1e3 - op_sum:+.3f} ms) ---")
    out = {"e2e_ms": sec * 1e3, "op_sum_ms": op_sum, "buckets": {}}
    for b, ms in buckets.most_common():
        print(f"{ms:8.3f} ms  {100 * ms / op_sum:5.1f}%  {b}")
        out["buckets"][b] = round(ms, 3)

    print(f"\n--- top {args.top} ops ---")
    for ms, op, name, src, b in rows[:args.top]:
        print(f"{ms:8.3f} ms  [{b:>18s}] {op[:28]:28s} "
              f"{name[-60:]:60s} {src}")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
