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

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Multi-host entry point (SURVEY.md 2.5): join the global JAX runtime.

    Call once per host process before any backend use; afterwards
    `jax.devices()` spans every host's chips and `make_mesh()` builds the
    global mesh, so the same `jit_train_step` shards across hosts with XLA
    collectives riding ICI intra-slice and DCN across slices -- zero
    framework code changes.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), then to
    TPU-pod auto-detection inside `jax.distributed.initialize` itself.
    Returns True if the distributed service was (already) initialized,
    False for the single-process fallback (no coordinator configured).
    """
    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return True                                 # already initialized
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False                                # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)
    return True


def make_mesh(num_data: Optional[int] = None, num_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    After `initialize_distributed`, `jax.devices()` is global across
    hosts, so the mesh (and every sharding derived from it) is too.
    """
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
    """Place a host batch on the mesh, sharded along the data axis.

    Single-host: a plain sharded device_put. Multi-host (after
    `initialize_distributed`): each host passes its *local* shard of the
    global batch and the global array is assembled without cross-host
    data movement (`jax.make_array_from_process_local_data`).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
                for k, v in batch.items()}
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_state(state, mesh: Mesh):
    """Replicate a host/device pytree onto the mesh.

    Single-host: plain device_put. Multi-host: device_put cannot target
    non-addressable shardings, so every leaf goes through
    `jax.make_array_from_process_local_data` (each process contributes
    the full value for a replicated spec); typed PRNG key arrays are
    round-tripped through their uint32 key data, which that API (and
    serialization generally) understands.
    """
    rep = replicated(mesh)
    if jax.process_count() <= 1:
        return jax.tree.map(lambda x: jax.device_put(x, rep), state)

    def put(x):
        if jnp.issubdtype(getattr(x, "dtype", np.float32),
                          jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            g = jax.make_array_from_process_local_data(rep, data)
            return jax.jit(jax.random.wrap_key_data,
                           out_shardings=rep)(g)
        return jax.make_array_from_process_local_data(rep, np.asarray(x))

    return jax.tree.map(put, state)


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


def jit_train_step_debug(train_step, mesh: Mesh, errors=None):
    """Debug twin of jit_train_step: the step runs under
    `jax.experimental.checkify` (user checks -- e.g. the fusion
    slab-overflow guard -- and div-by-zero, SURVEY.md section 5.2) and
    raises on the host with the failing check's source location. Slower
    (extra error state + a per-step host fetch); never used on the
    production path.

    float/index checks are NOT enabled by default: jax's
    pallas_call checkify rule mis-types the grid-loop carry for kernels
    with mixed-dtype scratch (fp32 planes + bf16 z1 in the fused fusion
    kernel), raising a TypeError at trace time. Pass
    `errors=checkify.all_checks` explicitly for configs that run the
    jnp twins (fusion.use_pallas=False, pallas_clip=False).
    """
    from jax.experimental import checkify

    if errors is None:
        errors = checkify.user_checks | checkify.div_checks
    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def checked_step(state, batch, pack):
        new_state, metrics = train_step(state, batch, pack)
        if "slab_overflow" in metrics:
            checkify.check(
                metrics["slab_overflow"] <= 0,
                "fusion z-slab overflow: {ov} pairs outside the DMA "
                "window would be dropped; raise FusionConfig.z_slab_cap",
                ov=metrics["slab_overflow"])
        return new_state, metrics

    cstep = jax.jit(
        checkify.checkify(checked_step, errors=errors),
        in_shardings=(rep, data, rep),
        donate_argnums=(0,),
    )

    def step_and_throw(state, batch, pack):
        err, out = cstep(state, batch, pack)
        checkify.check_error(err)
        return out

    return step_and_throw
