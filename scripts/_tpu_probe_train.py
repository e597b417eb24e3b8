import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from dcf.config import train_config, resolve_platform
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_varied_frame
from dcf.models.detector import ContFuseDetector
from dcf.train.state import create_train_state
from dcf.train.step import make_train_step
cfg = resolve_platform(train_config())
model = ContFuseDetector(cfg)
exs = [frame_to_example(make_varied_frame(seed=i), cfg, seed=i, training=True) for i in range(2)]
batch = {k: jnp.asarray(v) for k, v in stack_examples(exs).items()}
state = create_train_state(cfg, model, jax.random.key(0), batch)
step = jax.jit(make_train_step(cfg, model), donate_argnums=0)
t0 = time.perf_counter()
state, metrics = step(state, batch)
loss = float(metrics["loss"])
print("TRAIN OK loss", loss, "compile+run", time.perf_counter() - t0)
