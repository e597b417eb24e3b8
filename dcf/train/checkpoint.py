"""Atomic checkpoint save/restore (SURVEY.md T3, aux subsystem 3/4).

Full TrainState (params, optimizer state, step, PRNG key) serialized with
flax msgpack plus the config JSON for reproducibility. Writes are atomic
(temp file + rename) so a crash mid-save never corrupts the latest
checkpoint; the train loop resumes from any step (`--resume`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import serialization

from dcf.config import Config
from dcf.train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, cfg: Config,
                    keep: int = 5) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(state.step)
    # PRNG keys are opaque; store raw key data
    host_state = jax.device_get(state._replace(
        rng=jax.random.key_data(state.rng)))
    payload = serialization.to_bytes(host_state)
    path = os.path.join(ckpt_dir, f"ckpt_{step:08d}.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    cfg_path = os.path.join(ckpt_dir, "config.json")
    if not os.path.exists(cfg_path):
        tmp = cfg_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(cfg.to_json())
        os.replace(tmp, cfg_path)
    _prune(ckpt_dir, keep)
    return path


def _prune(ckpt_dir: str, keep: int) -> None:
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".msgpack"))
    for f in ckpts[:-keep]:
        os.remove(os.path.join(ckpt_dir, f))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(f for f in os.listdir(ckpt_dir)
                   if f.startswith("ckpt_") and f.endswith(".msgpack"))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore into a state template (from create_train_state).

    Checkpoints written before TrainState grew `ema_params` lack that
    key; restoring one into an EMA-enabled template seeds the EMA from
    the restored params (the only meaningful resume semantics for a run
    that just turned EMA on)."""
    tmpl = template._replace(rng=jax.random.key_data(template.rng))
    with open(path, "rb") as f:
        payload = f.read()
    sd = serialization.msgpack_restore(payload)
    if template.ema_params is None:
        # flax demands exact field-name parity on restore; normalize the
        # state dict to the template's shape (drop a saved EMA when
        # restoring with EMA off, inject None for pre-EMA files)
        sd["ema_params"] = None
    elif sd.get("ema_params") is None:
        sd["ema_params"] = jax.tree.map(lambda x: x, sd["params"])
    state = serialization.from_state_dict(tmpl, sd)
    return state._replace(
        rng=jax.random.wrap_key_data(jnp.asarray(state.rng)))


def load_config(ckpt_dir: str) -> Config:
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        return Config.from_json(f.read())
