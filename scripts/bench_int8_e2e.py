"""End-to-end int8-PTQ vs bf16 inference latency (dev tool).

Calibrates activation scales on the varied pool, then chains both the
bf16 and int8 jitted pipelines (same random-init params — latency does
not depend on weight values). AP-at-matched-checkpoint is a separate
gate (scripts/generalization.py); this measures only the speed side.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dcf.config import multi_scale_config, resolve_platform
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_varied_frame
from dcf.eval.inference import device_anchor_pack, make_inference_fn
from dcf.models.detector import ContFuseDetector
from dcf.quant import calibrate, quant_config
from dcf.utils.profiling import device_latency


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cfg = resolve_platform(multi_scale_config())
    examples = [frame_to_example(make_varied_frame(seed=i), cfg, seed=i)
                for i in range(8)]
    batch = {k: jnp.asarray(v) for k, v in stack_examples(
        examples[:B]).items()}
    pack = device_anchor_pack(cfg)

    model = ContFuseDetector(cfg)
    variables = jax.jit(model.init)(jax.random.key(0), batch)
    qvars = calibrate(cfg, variables, [batch])

    cfg_q = quant_config(cfg)
    model_q = ContFuseDetector(cfg_q)
    infer_f = make_inference_fn(cfg, model)
    infer_q = make_inference_fn(cfg_q, model_q)
    f = jax.jit(lambda p, b, k: infer_f(p, b, k)["scores"].sum())
    q = jax.jit(lambda p, b, k: infer_q(p, b, k)["scores"].sum())

    vars_q = {"params": variables["params"], **qvars}
    ms_f = device_latency(f, (variables, batch, pack)) * 1e3
    ms_q = device_latency(q, (vars_q, batch, pack)) * 1e3
    print(f"B={B}: bf16 {ms_f:.3f} ms/exec   int8 {ms_q:.3f} ms/exec   "
          f"speedup {ms_f/ms_q:.2f}x", flush=True)


if __name__ == "__main__":
    main()
