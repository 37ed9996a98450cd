"""Exponential moving average of model parameters.

The reference defines an EMA shadow model but never wires it into training
(/root/reference/rho_diffusion/ema.py:29-79 — ``ema_decay`` exists in its
TrainingConfig yet nothing reads it). Here EMA is a pure pytree update that
lives INSIDE the jitted train step, preserving the reference's warmup decay
semantics: effective decay = decay * (1 - exp(-step / 2000)), applied as
shadow <- shadow - (1 - decay_eff) * (shadow - param)  (ema.py:41-73).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_update(ema_params, params, step: jnp.ndarray, decay: float):
    """One EMA step. ``step`` is the (traced) PRE-increment global step.

    The reference increments its counter before computing the warmup
    fraction (ema.py:41-50), so the first update uses step_id=1 — we add 1
    here to match; otherwise decay_eff would be exactly 0 on step 0 (shadow
    snaps to params) and the EMA trajectory would lag one step forever.
    """
    # -expm1(-x), not 1-exp(-x): the latter cancels catastrophically in f32
    # for the small warmup fractions of the first few steps
    decay_eff = decay * -jnp.expm1(-(step.astype(jnp.float32) + 1.0) / 2000.0)
    return jax.tree_util.tree_map(
        lambda s, p: s - (1.0 - decay_eff) * (s - p), ema_params, params,
    )
