"""Train-step op-table profile on the real chip (dev tool).

Usage: python scripts/profile_train_step.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dcf.config import multi_scale_config, resolve_platform
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_varied_frame
from dcf.models.anchors import anchor_pack
from dcf.models.detector import ContFuseDetector
from dcf.train.state import create_train_state
from dcf.train.step import make_train_step
from dcf.utils.profiling import trace_op_table


def main():
    cfg = resolve_platform(multi_scale_config())
    model = ContFuseDetector(cfg)
    exs = [frame_to_example(make_varied_frame(seed=i), cfg, seed=i)
           for i in range(2)]
    batch = {k: jnp.asarray(v) for k, v in stack_examples(exs).items()}
    params = jax.jit(model.init)(jax.random.key(0),
                                 {k: v[:1] for k, v in batch.items()})
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    state = create_train_state(cfg, params)
    step = jax.jit(make_train_step(cfg, model))

    def fn(s, b, p):
        _, m = step(s, b, p)
        return m["loss"]

    compiled = jax.jit(make_train_step(cfg, model)).lower(
        state, batch, pack).compile()
    hlo_text = compiled.as_text()
    with open("/tmp/train_step_hlo.txt", "w") as f:
        f.write(hlo_text)
    rows = trace_op_table(fn, (state, batch, pack), "/tmp/trace_train",
                          top_k=100000, compiled_text=hlo_text)
    import json
    with open("/tmp/train_ops.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(list(r)) + "\n")
    print(f"total op time {sum(r[0] for r in rows):.2f} ms over "
          f"{len(rows)} ops")
    print("--- by source file ---")
    agg = {}
    for ms, op, name, src in rows:
        f = src.split(":")[0].split("/")[-1] if src else "(unattributed)"
        if "jit_train_step" in op or op == "0":
            continue
        agg[f] = agg.get(f, 0.0) + ms
    for f, ms in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{ms:9.3f}  {f}")
    print("--- top ops ---")
    for ms, op, name, src in rows[:45]:
        print(f"{ms:8.3f}  {op[:38]:38s} {name[:54]:54s} {src}")


if __name__ == "__main__":
    main()
