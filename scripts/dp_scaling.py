"""DP throughput scaling curve on the virtual CPU mesh (VERDICT round-2
item 3 / NOTES item 4).

Weak scaling: per-device batch fixed at 1, devices 1/2/4/8 from the
8-virtual-device CPU backend, the real pjit DP code path
(dcf.parallel.mesh.jit_train_step). On one host the virtual devices
time-slice the same cores, so ideal scaling is NOT flat steps/sec — the
curve's value is (a) proving the sharded step compiles and runs at every
mesh size and (b) showing frames/sec does not crater from collective
overhead. Run:  python scripts/dp_scaling.py [--steps 6]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args()

    from dcf.config import tiny_config
    from dcf.data.preprocess import frame_to_example, stack_examples
    from dcf.data.synthetic import make_varied_frame
    from dcf.models.anchors import anchor_pack
    from dcf.models.detector import ContFuseDetector
    from dcf.parallel import mesh as pmesh
    from dcf.train.state import create_train_state
    from dcf.train.step import make_train_step

    cfg = tiny_config(with_fusion=True)
    model = ContFuseDetector(cfg)
    examples = [frame_to_example(make_varied_frame(seed=i), cfg)
                for i in range(8)]
    init_b = {k: jnp.asarray(v[:1]) for k, v in
              stack_examples(examples[:1]).items()}
    params = jax.jit(model.init)(jax.random.key(0), init_b)
    pack_np = anchor_pack(cfg)

    results = {}
    for nd in (1, 2, 4, 8):
        mesh = pmesh.make_mesh(num_data=nd, devices=jax.devices()[:nd])
        state = pmesh.replicate_state(
            create_train_state(cfg, jax.tree.map(jnp.array, params)), mesh)
        pack = pmesh.replicate_state(
            {k: jnp.asarray(v) for k, v in pack_np.items()}, mesh)
        batch = pmesh.shard_batch(stack_examples(examples[:nd]), mesh)
        step = pmesh.jit_train_step(make_train_step(cfg, model), mesh)
        state, m = step(state, batch, pack)          # compile
        jax.block_until_ready(m["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, batch, pack)
        jax.block_until_ready(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        results[nd] = {"steps_per_sec": round(1.0 / dt, 3),
                       "frames_per_sec": round(nd / dt, 3),
                       "step_ms": round(dt * 1000.0, 1),
                       "loss": round(float(m["loss"]), 4)}
        print(f"devices={nd}: {results[nd]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
