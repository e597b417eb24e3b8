"""Worker process for the real 2-process jax.distributed test
(tests/test_multihost.py; VERDICT round-2 item 3).

Run as: python multihost_worker.py <proc_id> <num_procs> <port> <workdir>
with JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count set by
the parent. Joins the distributed runtime via
dcf.parallel.mesh.initialize_distributed (the REAL multi-host entry
point), then runs dcf.train.loop.train for 3 steps over a deterministic
single-frame dataset; process 0 writes the final checkpoint.
"""

import os
import sys
from dataclasses import replace

proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
port, workdir = sys.argv[3], sys.argv[4]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment ships JAX_PLATFORMS=axon and jax latches it at import;
# force the CPU backend the way tests/conftest.py does, and select the
# gloo CPU collectives implementation (required for cross-process
# collectives on the CPU backend -- without it each process comes up as
# its own single-process world).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from dcf.config import AugmentConfig, tiny_config  # noqa: E402
from dcf.data.synthetic import make_frame  # noqa: E402
from dcf.parallel import mesh as pmesh  # noqa: E402
from dcf.train.loop import train  # noqa: E402


def main():
    ok = pmesh.initialize_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs, process_id=proc_id)
    assert ok, "initialize_distributed fell back to single-process"
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == num_procs * jax.local_device_count()

    cfg = tiny_config(with_fusion=False)
    # deterministic pipeline: no augmentation; frame small enough that
    # crop_and_pad never subsamples (seed-independent examples), so the
    # 2-process run is comparable to a single-process global-batch run
    cfg = replace(
        cfg,
        augment=replace(cfg.augment, flip_prob=0.0, gt_sampling=False,
                        global_rotation=0.0, global_scale=(1.0, 1.0)),
        train=replace(cfg.train, batch_size=1, num_steps=3,
                      checkpoint_every=1000, log_every=1))
    frame = make_frame(seed=0, n_ground=1200, pts_per_box=100)

    class DS:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return frame

    state = train(cfg, DS(), workdir, num_steps=3)
    assert int(jax.device_get(state.step)) == 3
    print(f"proc {proc_id} done", flush=True)


if __name__ == "__main__":
    main()
