"""Training state: one pytree carrying everything a training step mutates.

Replaces the reference's scattered mutable state (Lightning module attrs,
optimizer object, never-wired EMA) with a single frozen dataclass that is
donated to the jitted train step. Checkpointing this pytree (orbax) gives
full resume — params, optimizer moments, EMA, step and RNG — which the
reference could not do (it saved backbone-only state_dicts,
utils.py:166-167).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray            # [] int32 global step
    params: Any                  # model parameter pytree
    opt_state: Any               # optax state pytree
    ema_params: Optional[Any]    # EMA shadow params (None when disabled)
    rng: jax.Array               # threaded PRNG key


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    ema: bool = False,
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema else None,
        rng=rng,
    )
