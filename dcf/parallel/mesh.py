"""Device mesh + sharding helpers (SURVEY.md 2.5).

The framework scales data-parallel via a named `jax.sharding.Mesh`:
batches are sharded along the `data` axis, parameters and optimizer state
are replicated, and XLA compiles the gradient all-reduce onto ICI
(intra-slice) / DCN (cross-host) by construction. A `model` axis is part of
the mesh from day one so tensor-parallel shardings can be added without an
API change (the reference model is tens of MB, so TP is not needed for
capability parity -- SURVEY.md 2.5).

Works identically on real TPU slices and on the CPU virtual-device mesh
(`--xla_force_host_platform_device_count=N`) used by tests and the driver's
multi-chip dry run.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    n = num_data * num_model
    grid = np.array(devices[:n]).reshape(num_data, num_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict, mesh: Mesh) -> Dict:
    """Place a host batch on the mesh, sharded along the data axis."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), state)


def jit_train_step(train_step, mesh: Mesh):
    """jit a train step with DP shardings: state + anchor pack replicated,
    batch sharded on `data`, donated state buffers.

    Signature: train_step(state, batch, anchor_pack)."""
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(rep, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def jit_train_step_debug(train_step, mesh: Mesh):
    """Debug twin of jit_train_step: the step runs under
    `jax.experimental.checkify` (NaN / out-of-bounds / div-by-zero checks,
    SURVEY.md section 5.2) and raises on the host with the failing check's
    source location. Slower (extra error state + a per-step host fetch);
    never used on the production path.
    """
    from jax.experimental import checkify

    errors = (checkify.float_checks | checkify.index_checks
              | checkify.user_checks | checkify.div_checks)
    rep = replicated(mesh)
    data = batch_sharding(mesh)
    cstep = jax.jit(
        checkify.checkify(train_step, errors=errors),
        in_shardings=(rep, data, rep),
        donate_argnums=(0,),
    )

    def step_and_throw(state, batch, pack):
        err, out = cstep(state, batch, pack)
        checkify.check_error(err)
        return out

    return step_and_throw
