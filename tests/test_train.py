"""Training-stack tests: step mechanics, overfit smoke, checkpointing,
multi-device DP (SURVEY.md 4.5/4.6)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dcf.config import tiny_config
from dcf.data.preprocess import frame_to_example, stack_examples
from dcf.data.synthetic import make_frame
from dcf.models.anchors import anchor_pack
from dcf.models.detector import ContFuseDetector
from dcf.parallel import mesh as pmesh
from dcf.train import checkpoint as ckpt
from dcf.train.state import create_train_state
from dcf.train.step import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config(with_fusion=True)
    model = ContFuseDetector(cfg)
    frame = make_frame(seed=0)
    batch = {k: jnp.asarray(v) for k, v in stack_examples(
        [frame_to_example(frame, cfg)] * 2).items()}
    params = jax.jit(model.init)(jax.random.key(0), batch)
    state = create_train_state(cfg, params)
    pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
    # no donation here: tests reuse the fixture state across cases
    step = jax.jit(make_train_step(cfg, model))
    return cfg, model, batch, state, pack, step


class TestTrainStep:
    def test_loss_decreases_overfit(self, setup):
        cfg, model, batch, state, pack, step = setup
        losses = []
        for _ in range(12):
            state, metrics = step(state, batch, pack)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        assert float(metrics["num_pos"]) > 0

    def test_grad_norm_finite(self, setup):
        cfg, model, batch, state, pack, step = setup
        _, metrics = step(state, batch, pack)
        assert np.isfinite(float(metrics["grad_norm"]))


class TestCheckpoint:
    def test_roundtrip(self, setup, tmp_path):
        cfg, model, batch, state, pack, step = setup
        state, _ = step(state, batch, pack)
        path = ckpt.save_checkpoint(str(tmp_path), jax.device_get(state),
                                    cfg)
        assert os.path.exists(path)
        template = create_train_state(
            cfg, jax.tree.map(jnp.zeros_like, state.params))
        restored = ckpt.restore_checkpoint(path, template)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_atomicity_artifacts(self, setup, tmp_path):
        cfg, model, batch, state, pack, step = setup
        ckpt.save_checkpoint(str(tmp_path), jax.device_get(state), cfg)
        files = os.listdir(tmp_path)
        assert not any(f.endswith(".tmp") for f in files)
        assert "config.json" in files
        cfg2 = ckpt.load_config(str(tmp_path))
        assert cfg2 == cfg

    def test_ema_tracks_params_and_roundtrips(self, setup, tmp_path):
        """TrainConfig.ema_decay: the EMA follows the recurrence inside
        the jitted step, and checkpoints round-trip in all four
        (saved-with, restored-with) x (EMA on, off) combinations."""
        import dataclasses
        cfg, model, batch, state, pack, _ = setup
        cfg_e = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, ema_decay=0.9))
        s = create_train_state(cfg_e, state.params)
        assert s.ema_params is not None
        step_e = jax.jit(make_train_step(cfg_e, model))
        want = jax.device_get(s.params)
        for _ in range(3):
            s, _m = step_e(s, batch, pack)
            want = jax.tree.map(
                lambda e, p: e * 0.9 + np.asarray(p, e.dtype) * 0.1,
                want, jax.device_get(s.params))
        got = jax.device_get(s.ema_params)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

        # EMA ckpt -> EMA template
        path = ckpt.save_checkpoint(str(tmp_path), jax.device_get(s),
                                    cfg_e)
        tmpl = create_train_state(
            cfg_e, jax.tree.map(jnp.zeros_like, s.params))
        r = ckpt.restore_checkpoint(path, tmpl)
        for a, b in zip(jax.tree.leaves(jax.device_get(r.ema_params)),
                        jax.tree.leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # EMA ckpt -> no-EMA template (EMA dropped)
        r2 = ckpt.restore_checkpoint(
            path, create_train_state(cfg, state.params))
        assert r2.ema_params is None
        # no-EMA ckpt -> EMA template (EMA seeded from params)
        path3 = ckpt.save_checkpoint(
            str(tmp_path / "legacy"),
            jax.device_get(create_train_state(cfg, state.params)), cfg)
        r3 = ckpt.restore_checkpoint(path3, tmpl)
        for a, b in zip(jax.tree.leaves(r3.ema_params),
                        jax.tree.leaves(r3.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_latest_and_prune(self, setup, tmp_path):
        cfg, model, batch, state, pack, step = setup
        host = jax.device_get(state)
        for s in range(7):
            host = host._replace(step=jnp.asarray(s))
            ckpt.save_checkpoint(str(tmp_path), host, cfg, keep=3)
        names = sorted(f for f in os.listdir(tmp_path)
                       if f.startswith("ckpt_"))
        assert len(names) == 3
        assert ckpt.latest_checkpoint(str(tmp_path)).endswith(names[-1])


class TestDataParallel:
    def test_dp_train_step_8_devices(self):
        """Real pjit mesh path on the 8-device virtual CPU mesh
        (SURVEY.md 4.6)."""
        assert len(jax.devices()) >= 8
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)

    def test_dp_matches_single_device(self):
        """One DP step on 4 devices == same step on 1 device."""
        cfg = tiny_config(with_fusion=False)
        model = ContFuseDetector(cfg)
        examples = [frame_to_example(make_frame(seed=i), cfg)
                    for i in range(4)]
        batch_np = stack_examples(examples)
        init_b = {k: jnp.asarray(v[:1]) for k, v in batch_np.items()}
        params = jax.jit(model.init)(jax.random.key(0), init_b)
        pack_np = anchor_pack(cfg)

        def run(n_dev):
            mesh = pmesh.make_mesh(num_data=n_dev,
                                   devices=jax.devices()[:n_dev])
            # fresh param copies: the donated train step would otherwise
            # consume the shared originals (device_put no-ops when the
            # target placement matches, so donation hits the source)
            fresh = jax.tree.map(jnp.array, params)
            state = pmesh.replicate_state(
                create_train_state(cfg, fresh), mesh)
            pack = pmesh.replicate_state(
                {k: jnp.asarray(v) for k, v in pack_np.items()}, mesh)
            batch = pmesh.shard_batch(batch_np, mesh)
            step = pmesh.jit_train_step(make_train_step(cfg, model), mesh)
            state, metrics = step(state, batch, pack)
            return jax.device_get(state.params), float(metrics["loss"])

        p1, l1 = run(1)
        p4, l4 = run(4)
        np.testing.assert_allclose(l1, l4, rtol=1e-5)
        # cross-device psum reassociates float adds: tolerate tiny drift
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p4)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


@pytest.mark.skipif(not os.environ.get("DCF_SLOW_TESTS"),
                    reason="slow integration test (set DCF_SLOW_TESTS=1)")
class TestOverfitIntegration:
    def test_overfit_one_frame_reaches_full_ap(self):
        """SURVEY.md 4.5: loss -> ~0 and AP -> 1.0 on a single frame."""
        from dataclasses import replace
        from dcf.data.synthetic import make_frame
        from dcf.eval.evaluate import run_eval
        cfg = tiny_config(with_fusion=True)
        cfg = replace(cfg, train=replace(cfg.train, learning_rate=1e-3,
                                         num_steps=400, warmup_steps=50))
        frame = make_frame(seed=0)
        batch = {k: jnp.asarray(v) for k, v in stack_examples(
            [frame_to_example(frame, cfg)] * 2).items()}
        model = ContFuseDetector(cfg)
        params = jax.jit(model.init)(jax.random.key(0),
                                     {k: v[:1] for k, v in batch.items()})
        state = create_train_state(cfg, params)
        pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
        step = jax.jit(make_train_step(cfg, model), donate_argnums=(0,))
        for _ in range(400):
            state, metrics = step(state, batch, pack)
        assert float(metrics["loss"]) < 0.1

        class DS:
            def __len__(self):
                return 1

            def __getitem__(self, i):
                return frame

        # num_points=0: exact area-under-PR AP -- the devkit's 41-point
        # recall grid quantizes AP to ~k/41 on a single-frame split
        res = run_eval(cfg, model, state.params, DS(), score_threshold=0.3,
                       num_points=0)
        assert res["Car_3d_moderate"] > 0.95
        assert res["Pedestrian_3d_moderate"] > 0.95
        assert res["Cyclist_3d_moderate"] > 0.95


class TestMultiHost:
    def test_initialize_distributed_single_process_noop(self, monkeypatch):
        # without a coordinator configured this must be a no-op fallback
        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert pmesh.initialize_distributed() is False
        assert jax.process_count() == 1     # backend untouched

    def test_process_shard_disjoint_and_covering(self):
        from dcf.train.loop import _ProcessShard
        data = list(range(10))
        shards = [_ProcessShard(data, p, 3) for p in range(3)]
        per_shard = [[s[i] for i in range(len(s))] for s in shards]
        # strides are disjoint and together cover the dataset
        assert per_shard[0] == [0, 3, 6, 9]
        assert per_shard[1] == [1, 4, 7]
        assert per_shard[2] == [2, 5, 8]
        assert set().union(*map(set, per_shard)) == set(range(10))


@pytest.mark.skipif(not os.environ.get("DCF_GENERALIZATION_TEST"),
                    reason="TPU-scale integration run (set "
                           "DCF_GENERALIZATION_TEST=1; ~30 min on a v5e)")
class TestGeneralization:
    def test_learns_on_held_out_synthetic_frames(self, tmp_path):
        """VERDICT round-1 item 4: train on 64 seed-varied synthetic
        frames, evaluate devkit AP on 16 disjoint-seed frames -- proves
        learning, not just overfit plumbing. Thresholds calibrated from
        the round-2 runs recorded in BASELINE.md."""
        import json
        import subprocess
        import sys
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        subprocess.run(
            [sys.executable, os.path.join(repo, "scripts",
                                          "generalization.py"),
             "--steps", "5000", "--workdir", str(tmp_path)],
            check=True, cwd=repo, timeout=7200)
        with open(tmp_path / "generalization.json") as f:
            r = json.load(f)
        # measured at 5000 steps (BASELINE.md round-2): Car 0.90,
        # Pedestrian 1.0, Cyclist 0.68 -- thresholds leave seed margin
        assert r["Car_3d_moderate_exact"] > 0.6
        assert r["Pedestrian_3d_moderate_exact"] > 0.8
        assert r["Cyclist_3d_moderate_exact"] > 0.4
        assert r["Car_bev_moderate_exact"] >= r["Car_3d_moderate_exact"]


class TestSlabOverflow:
    """VERDICT round-2 item 7: fusion slab overflow must be surfaced,
    not silently dropped -- as a train metric always, and as a checkify
    error in the debug step."""

    def _setup(self, z_slab_cap):
        from dataclasses import replace
        from dcf.config import VoxelConfig
        cfg = tiny_config(with_fusion=True)
        # run the REAL pallas kernel path in interpret mode on CPU so
        # slab_starts / overflow accounting is exercised; geometry is
        # shrunk well below tiny_config (interpret mode emulates every
        # grid program -- the full tiny grid costs ~15 min per compile)
        cfg = replace(
            cfg,
            voxel=VoxelConfig(x_max=12.8, y_min=-6.4, y_max=6.4,
                              voxel_size=0.2, max_points=512),
            backbone=replace(cfg.backbone, fusion_strides=(2, 4)),
            fusion=replace(cfg.fusion, use_pallas=True,
                           pallas_interpret=True, z_slab_cap=z_slab_cap))
        model = ContFuseDetector(cfg)
        frame = make_frame(seed=0, n_ground=3000, pts_per_box=200)
        batch_np = stack_examples([frame_to_example(frame, cfg)] * 2)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        params = jax.jit(model.init)(jax.random.key(0), batch)
        pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}
        return cfg, model, batch, batch_np, params, pack

    def test_metric_reported_and_zero_at_default_cap(self):
        cfg, model, batch, _, params, pack = self._setup(z_slab_cap=512)
        step = jax.jit(make_train_step(cfg, model))
        from dcf.train.state import create_train_state
        state = create_train_state(cfg, params)
        _, metrics = step(state, batch, pack)
        assert "slab_overflow" in metrics
        assert float(metrics["slab_overflow"]) == 0.0

    def test_slab_cap_max_clamp(self):
        """z_slab_cap_max: a non-biting ceiling is a bit-exact no-op;
        a biting one still runs finite with overflow surfaced through
        the usual metric (the clamp only shrinks the kernel's slab
        geometry -- BASELINE.md round-5 VMEM note)."""
        from dataclasses import replace
        cfg, model, batch, _, params, pack = self._setup(z_slab_cap=512)
        from dcf.train.state import create_train_state

        def run(c):
            m = ContFuseDetector(c)
            step = jax.jit(make_train_step(c, m))
            state = create_train_state(c, params)
            _, metrics = step(state, batch, pack)
            return metrics

        base = run(cfg)
        # ratio at the coarse (s4) scale is 2 -> scaled cap 1024; a
        # 2048 ceiling never bites: identical metrics bit-for-bit
        noop = run(replace(cfg, fusion=replace(cfg.fusion,
                                               z_slab_cap_max=2048)))
        for k in base:
            np.testing.assert_array_equal(
                np.asarray(base[k]), np.asarray(noop[k]), err_msg=k)
        # a 512 ceiling halves the coarse slab: finite loss, overflow
        # counted through the usual metric path (may be zero on this
        # tiny cloud, but the graph must build and run)
        tight = run(replace(cfg, fusion=replace(cfg.fusion,
                                                z_slab_cap_max=512)))
        assert np.isfinite(float(tight["loss"]))
        assert "slab_overflow" in tight

    def test_undersized_cap_counts_and_debug_step_raises(self):
        cfg, model, batch, batch_np, params, pack = self._setup(
            z_slab_cap=128)
        state = create_train_state(cfg, params)
        step = jax.jit(make_train_step(cfg, model))
        _, metrics = step(state, batch, pack)
        assert float(metrics["slab_overflow"]) > 0   # counted, not hidden

        mesh = pmesh.make_mesh(num_data=1, devices=jax.devices()[:1])
        state = pmesh.replicate_state(
            create_train_state(cfg, jax.tree.map(jnp.array, params)), mesh)
        packm = pmesh.replicate_state(
            {k: jnp.asarray(v) for k, v in pack.items()}, mesh)
        batchm = pmesh.shard_batch(batch_np, mesh)
        dstep = pmesh.jit_train_step_debug(make_train_step(cfg, model),
                                           mesh)
        with pytest.raises(Exception, match="z-slab overflow"):
            dstep(state, batchm, packm)


class TestAutoAccum:
    """dcf.train.loop.auto_accum: single-shard batches above
    micro_batch_max accumulate; everything else passes through."""

    def test_policy(self):
        import dataclasses
        from dcf.train.loop import auto_accum
        cfg = tiny_config()

        def with_train(**kw):
            return dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, **kw))

        # batch 8, micro cap 2, one shard -> accum 4
        c = auto_accum(with_train(batch_size=8, micro_batch_max=2), 1)
        assert c.train.accum_steps == 4
        # multi-shard DP: untouched
        c = auto_accum(with_train(batch_size=8, micro_batch_max=2), 4)
        assert c.train.accum_steps == 1
        # batch already <= cap: untouched
        c = auto_accum(with_train(batch_size=2, micro_batch_max=2), 1)
        assert c.train.accum_steps == 1
        # explicit accum respected
        c = auto_accum(with_train(batch_size=8, micro_batch_max=2,
                                  accum_steps=2), 1)
        assert c.train.accum_steps == 2
        # cap disabled
        c = auto_accum(with_train(batch_size=8, micro_batch_max=0), 1)
        assert c.train.accum_steps == 1
        # non-divisible: untouched (step asserts divisibility elsewhere)
        c = auto_accum(with_train(batch_size=6, micro_batch_max=4), 1)
        assert c.train.accum_steps == 1


class TestGradientAccumulation:
    def test_accum_matches_full_batch(self):
        """accum_steps=2 must produce the same update as the full batch:
        the math is exact (num_pos is param-independent, so
        sums-then-normalize lands the full-batch gradient), but the
        micro-batch forward is a different compiled program (B=2 vs B=4
        shapes), so bf16 tolerances apply."""
        from dataclasses import replace
        cfg = tiny_config(with_fusion=True)
        model = ContFuseDetector(cfg)
        examples = [frame_to_example(make_frame(seed=i), cfg)
                    for i in range(4)]
        batch = {k: jnp.asarray(v) for k, v in
                 stack_examples(examples).items()}
        params = jax.jit(model.init)(jax.random.key(0),
                                     {k: v[:1] for k, v in batch.items()})
        pack = {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}

        outs = {}
        for accum in (1, 2):
            c = replace(cfg, train=replace(cfg.train, accum_steps=accum))
            state = create_train_state(c, jax.tree.map(jnp.array, params))
            step = jax.jit(make_train_step(c, model))
            state, metrics = step(state, batch, pack)
            outs[accum] = (jax.device_get(state.params),
                           {k: float(v) for k, v in metrics.items()})

        m1, m2 = outs[1][1], outs[2][1]
        assert m1["num_pos"] == m2["num_pos"]
        np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=2e-3)
        for a, b in zip(jax.tree.leaves(outs[1][0]),
                        jax.tree.leaves(outs[2][0])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-3)
