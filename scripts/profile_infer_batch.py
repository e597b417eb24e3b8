"""Inference op-table profile at two batch sizes (dev tool) -- finds
where per-frame time grows when batching (round-2 item: B>1 regression).

Usage: python scripts/profile_infer_batch.py [B1] [B2]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dcf.config import multi_scale_config, resolve_platform
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_varied_frame
from dcf.eval.inference import make_inference_fn
from dcf.models.anchors import anchor_pack
from dcf.models.detector import ContFuseDetector
from dcf.utils.profiling import trace_op_table


def agg_by_source(rows):
    agg = {}
    for ms, op, name, src in rows:
        if "jit" in op or op == "0":
            continue
        f = src.split(":")[0].split("/")[-1] if src else "(unattributed)"
        agg[f] = agg.get(f, 0.0) + ms
    return agg


def main():
    b1 = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    b2 = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cfg = resolve_platform(multi_scale_config())
    model = ContFuseDetector(cfg)
    infer0 = make_inference_fn(cfg, model)

    def build(bs):
        exs = [frame_to_example(make_varied_frame(seed=i), cfg, seed=i)
               for i in range(bs)]
        return {k: jnp.asarray(v) for k, v in stack_examples(exs).items()}

    batch1 = build(1)
    params = jax.jit(model.init)(jax.random.key(0), batch1)
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    fn = jax.jit(lambda p, b, k: infer0(p, b, k)["scores"].sum())

    tables = {}
    for bs in (b1, b2):
        batch = build(bs)
        compiled = jax.jit(
            lambda p, b, k: infer0(p, b, k)["scores"].sum()).lower(
                params, batch, pack).compile()
        rows = trace_op_table(fn, (params, batch, pack),
                              f"/tmp/trace_infer_b{bs}", top_k=100000,
                              compiled_text=compiled.as_text())
        tables[bs] = rows

    a1, a2 = agg_by_source(tables[b1]), agg_by_source(tables[b2])
    print(f"{'source':28s} {'B=' + str(b1):>10s} {'B=' + str(b2):>10s} "
          f"{'per-frame ratio':>16s}")
    for f in sorted(set(a1) | set(a2),
                    key=lambda f: -(a2.get(f, 0.0))):
        v1, v2 = a1.get(f, 0.0), a2.get(f, 0.0)
        ratio = (v2 / b2) / max(v1 / b1, 1e-9)
        print(f"{f:28s} {v1:10.3f} {v2:10.3f} {ratio:16.2f}")
    print(f"\n--- top B={b2} ops ---")
    for ms, op, name, src in tables[b2][:35]:
        print(f"{ms:8.3f}  {op[:40]:40s} {src}")


if __name__ == "__main__":
    main()
