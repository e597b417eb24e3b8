import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from dcf.config import multi_scale_config, resolve_platform
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_varied_frame
from dcf.eval.inference import make_inference_fn
from dcf.models.anchors import anchor_pack
from dcf.models.detector import ContFuseDetector
cfg = resolve_platform(multi_scale_config())
model = ContFuseDetector(cfg)
ex = frame_to_example(make_varied_frame(seed=0), cfg, seed=0)
batch = {k: jnp.asarray(v) for k, v in stack_examples([ex]).items()}
params = jax.jit(model.init)(jax.random.key(0), batch)
infer0 = make_inference_fn(cfg, model)
pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
infer = jax.jit(lambda p, b, k: infer0(p, b, k)["scores"].sum())
t0 = time.perf_counter()
out = float(infer(params, batch, pack))
print("INFER OK", out, "compile+run", time.perf_counter() - t0)
