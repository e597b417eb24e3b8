"""Train state + optimizer factory (SURVEY.md T2).

A single donated TrainState (params, optax state, step, PRNG key) threaded
through a jitted train step; optimizer is AdamW with linear warmup + cosine
decay and global-norm gradient clipping.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dcf.config import Config


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jnp.ndarray
    # Exponential moving average of params (TrainConfig.ema_decay > 0),
    # updated inside the jitted step; None when EMA is disabled.
    ema_params: Any = None


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.train
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=t.learning_rate * 0.01,
        peak_value=t.learning_rate,
        warmup_steps=t.warmup_steps,
        decay_steps=max(t.num_steps, t.warmup_steps + 1),
        end_value=t.learning_rate * 0.01)
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip_norm),
        optax.adamw(schedule, weight_decay=t.weight_decay),
    )


def create_train_state(cfg: Config, params: Any, seed: int = 0) -> TrainState:
    tx = make_optimizer(cfg)
    ema = (jax.tree.map(jnp.array, params)
           if cfg.train.ema_decay > 0 else None)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params),
                      rng=jax.random.key(seed), ema_params=ema)
