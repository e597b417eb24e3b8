"""Training orchestration (SURVEY.md T2/T8, call stack 3.1).

Host loop responsibilities only: feed prefetched batches, log scalars,
checkpoint periodically. Everything numerical lives in the jitted,
DP-sharded train step.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp

from dcf.config import Config
from dcf.data.loader import Loader, infinite_batches
from dcf.models.anchors import anchor_pack
from dcf.models.detector import ContFuseDetector
from dcf.parallel import mesh as pmesh
from dcf.train import checkpoint as ckpt
from dcf.train.state import TrainState, create_train_state
from dcf.train.step import make_train_step
from dcf.utils.logging import MetricsLogger


class _ProcessShard:
    """Dataset view restricted to this host's stride (multi-host DP): host
    p of n sees frames p, p+n, p+2n, ... so hosts read disjoint data.

    Step-based semantics, not epoch-exact: indexing wraps modulo the
    underlying dataset, so for uneven dataset/process splits a host may
    revisit a frame within what another host would call an "epoch", and
    `len()` clamps to >= 1 so every host can always draw a batch. Fine
    for the step-count training this framework does; an epoch-exact
    notion would need drop-last/padding semantics instead."""

    def __init__(self, dataset, process_index: int, process_count: int):
        self.dataset = dataset
        self.offset = process_index
        self.stride = process_count

    def __len__(self) -> int:
        return max((len(self.dataset) - self.offset + self.stride - 1)
                   // self.stride, 1)

    def __getitem__(self, i: int):
        return self.dataset[(i * self.stride + self.offset)
                            % len(self.dataset)]


def auto_accum(cfg: Config, num_data_shards: int,
               verbose: bool = False) -> Config:
    """Cap the compiled micro-batch for single-device steps.

    The coarsest fusion backward kernel exceeds the v5e's 16 MB
    scoped-VMEM limit when the train step compiles at B=8 (B=2 is fine),
    so a single-shard step at batch > TrainConfig.micro_batch_max
    auto-raises accum_steps to keep micro-batches at that size --
    gradients stay exact full-batch (dcf.train.step.make_train_step).
    Multi-shard DP already reduces the per-device batch by itself, and
    an explicit accum_steps > 1 is respected as-is.
    """
    t = cfg.train
    if (num_data_shards == 1 and t.micro_batch_max
            and t.accum_steps == 1
            and t.batch_size > t.micro_batch_max
            and t.batch_size % t.micro_batch_max == 0):
        import dataclasses
        accum = t.batch_size // t.micro_batch_max
        if verbose:
            print(f"single-shard batch {t.batch_size}: accumulating "
                  f"{accum} micro-batches of {t.micro_batch_max}")
        return dataclasses.replace(
            cfg, train=dataclasses.replace(t, accum_steps=accum))
    return cfg


def train(cfg: Config, dataset, workdir: str,
          gt_db=None, resume: bool = False,
          num_steps: Optional[int] = None,
          num_data_shards: Optional[int] = None,
          debug: bool = False,
          eval_hook=None, eval_every: int = 0) -> TrainState:
    """Run (or resume) a training job. Returns the final state.

    Multi-host: call `dcf.parallel.mesh.initialize_distributed` first;
    the mesh then spans every host's devices, each host loads a disjoint
    stride of the dataset (global batch = cfg.train.batch_size x hosts),
    and only process 0 writes checkpoints/logs.

    debug=True runs the step under checkify (NaN/OOB/div checks raise on
    the host with source locations) -- slower, for debugging only.

    eval_hook(host_state, step) is called every `eval_every` steps (and
    at the final step) on process 0 with the device_get TrainState --
    for periodic validation / best-checkpoint selection (see
    scripts/generalization.py --eval-every)."""
    is_main = jax.process_index() == 0
    if jax.process_count() > 1:
        dataset = _ProcessShard(dataset, jax.process_index(),
                                jax.process_count())
    os.makedirs(workdir, exist_ok=True)
    if num_data_shards is None:
        # largest device count the global batch divides evenly across
        nd = jax.device_count()
        bs = cfg.train.batch_size * jax.process_count()
        num_data_shards = max(d for d in range(1, nd + 1) if bs % d == 0)
    elif (cfg.train.batch_size * jax.process_count()) % num_data_shards:
        raise ValueError(
            f"global batch {cfg.train.batch_size * jax.process_count()} "
            f"not divisible by --data-shards {num_data_shards}")
    mesh = pmesh.make_mesh(num_data=num_data_shards)
    cfg = auto_accum(cfg, num_data_shards, verbose=is_main)
    model = ContFuseDetector(cfg)
    loader = Loader(dataset, cfg, training=True, gt_db=gt_db,
                    seed=cfg.train.seed + jax.process_index())

    batches = infinite_batches(loader)
    first = next(batches)
    init_batch = {k: jnp.asarray(v[:1]) for k, v in first.items()}
    params = jax.jit(model.init)(jax.random.key(cfg.train.seed), init_batch)
    state = create_train_state(cfg, params, seed=cfg.train.seed)

    # Multi-host resume assumes `workdir` is on a filesystem every
    # process can read (NFS/GCS-fuse on TPU pods): proc 0 writes
    # checkpoints, every process restores from the same path.
    ckpt_dir = os.path.join(workdir, "checkpoints")
    if resume:
        latest = ckpt.latest_checkpoint(ckpt_dir)
        if latest:
            state = ckpt.restore_checkpoint(latest, state)
            print(f"resumed from {latest} at step {int(state.step)}")

    state = pmesh.replicate_state(state, mesh)
    pack = pmesh.replicate_state(
        {k: jnp.asarray(v) for k, v in anchor_pack(cfg).items()}, mesh)
    if debug:
        # full float/index checks only when no Pallas kernel is in the
        # graph (see jit_train_step_debug's docstring)
        from jax.experimental import checkify
        has_pallas = (cfg.with_fusion and cfg.fusion.use_pallas
                      ) or cfg.pallas_clip
        step_fn = pmesh.jit_train_step_debug(
            make_train_step(cfg, model), mesh,
            errors=None if has_pallas else checkify.all_checks)
    else:
        step_fn = pmesh.jit_train_step(make_train_step(cfg, model), mesh)

    logger = MetricsLogger(os.path.join(workdir, "metrics.jsonl"))
    total = num_steps if num_steps is not None else cfg.train.num_steps
    t0 = time.time()
    pool = None
    if cfg.train.resident_batches:
        # Device-resident batch pool (see TrainConfig.resident_batches:
        # the tunneled client leaks every host->device transfer, so long
        # runs must not stream per-step batches).
        import itertools
        import random as _random
        n = cfg.train.resident_batches
        pool = [pmesh.shard_batch(b, mesh) for b in itertools.islice(
            itertools.chain([first], batches), n)]
        jax.block_until_ready(pool[-1])
        rng_order = _random.Random(cfg.train.seed + 17)
        order = list(range(len(pool)))
        if is_main:
            print(f"resident batch pool: {len(pool)} batches on device")
    pending = first
    # host-side step counter: fetching the device scalar every iteration
    # serializes a ~25 ms RPC against each step on tunneled backends;
    # the device counter is only consulted once here (resume) and at
    # checkpoint time
    step = int(jax.device_get(state.step))
    while step < total:
        if pool is not None:
            if step % len(pool) == 0:
                rng_order.shuffle(order)
            batch = pool[order[step % len(pool)]]
        else:
            batch = pmesh.shard_batch(pending, mesh)
        state, metrics = step_fn(state, batch, pack)
        if pool is None:
            pending = next(batches)
        step += 1
        if (step % cfg.train.log_every == 0 or step == total) and is_main:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            m["step"] = step
            m["steps_per_sec"] = cfg.train.log_every / max(
                time.time() - t0, 1e-9)
            t0 = time.time()
            logger.log(m)
        if (step % cfg.train.checkpoint_every == 0
                or step == total) and is_main:
            path = ckpt.save_checkpoint(ckpt_dir, jax.device_get(state), cfg)
            print(f"saved {path}")
        if (eval_hook is not None and eval_every
                and (step % eval_every == 0 or step == total)
                and is_main):
            eval_hook(jax.device_get(state), step)
    return state
