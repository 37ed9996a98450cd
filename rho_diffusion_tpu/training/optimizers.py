"""Optimizer and LR-scheduler factories (optax-backed, torch-named).

The reference prepopulates its registry with 13 torch.optim optimizers
(/root/reference/rho_diffusion/registry.py:160-203) and resolves them by name
from the JSON config; lr schedulers like CosineAnnealingLR are named the same
way (examples/config_*.json). Here each name maps to an optax
GradientTransformation factory accepting the familiar torch kwargs
(lr/betas/eps/weight_decay/momentum), so configs carry over unchanged.

LR schedulers are optax schedules parameterised in EPOCHS like torch
(CosineAnnealingLR's T_max is epochs); ``build_lr_schedule`` converts with
steps_per_epoch at trainer-construction time.
"""
from __future__ import annotations

from typing import Any, Optional

import optax

from rho_diffusion_tpu.registry import registry


def _adam_args(kwargs: dict) -> dict:
    betas = kwargs.get("betas", (0.9, 0.999))
    return {
        "b1": betas[0],
        "b2": betas[1],
        "eps": kwargs.get("eps", 1e-8),
    }


def _lr(kwargs: dict, default: float = 1e-3):
    return kwargs.get("learning_rate", kwargs.get("lr", default))


@registry.register_optimizer("AdamW")
def AdamW(**kwargs) -> optax.GradientTransformation:
    return optax.adamw(
        _lr(kwargs),
        weight_decay=kwargs.get("weight_decay", 0.01),
        **_adam_args(kwargs),
    )


@registry.register_optimizer("Adam")
def Adam(**kwargs) -> optax.GradientTransformation:
    return optax.adam(_lr(kwargs), **_adam_args(kwargs))


@registry.register_optimizer("Adamax")
def Adamax(**kwargs) -> optax.GradientTransformation:
    return optax.adamax(_lr(kwargs, 2e-3), **_adam_args(kwargs))


@registry.register_optimizer("NAdam")
def NAdam(**kwargs) -> optax.GradientTransformation:
    return optax.nadam(_lr(kwargs, 2e-3), **_adam_args(kwargs))


@registry.register_optimizer("RAdam")
def RAdam(**kwargs) -> optax.GradientTransformation:
    return optax.radam(_lr(kwargs), **_adam_args(kwargs))


@registry.register_optimizer("SGD")
def SGD(**kwargs) -> optax.GradientTransformation:
    return optax.sgd(
        _lr(kwargs),
        momentum=kwargs.get("momentum") or None,
        nesterov=kwargs.get("nesterov", False),
    )


@registry.register_optimizer("RMSprop")
def RMSprop(**kwargs) -> optax.GradientTransformation:
    return optax.rmsprop(
        _lr(kwargs, 1e-2),
        decay=kwargs.get("alpha", 0.99),
        eps=kwargs.get("eps", 1e-8),
        momentum=kwargs.get("momentum", 0.0) or None,
    )


@registry.register_optimizer("Adagrad")
def Adagrad(**kwargs) -> optax.GradientTransformation:
    return optax.adagrad(_lr(kwargs, 1e-2), eps=kwargs.get("eps", 1e-10))


@registry.register_optimizer("Adadelta")
def Adadelta(**kwargs) -> optax.GradientTransformation:
    return optax.adadelta(
        _lr(kwargs, 1.0), rho=kwargs.get("rho", 0.9), eps=kwargs.get("eps", 1e-6),
    )


@registry.register_optimizer("Adafactor")
def Adafactor(**kwargs) -> optax.GradientTransformation:
    return optax.adafactor(_lr(kwargs, None))


@registry.register_optimizer("Lion")
def Lion(**kwargs) -> optax.GradientTransformation:
    return optax.lion(
        _lr(kwargs, 1e-4),
        weight_decay=kwargs.get("weight_decay", 0.0),
        **{k: v for k, v in _adam_args(kwargs).items() if k in ("b1", "b2")},
    )


@registry.register_optimizer("LAMB")
def LAMB(**kwargs) -> optax.GradientTransformation:
    return optax.lamb(
        _lr(kwargs),
        weight_decay=kwargs.get("weight_decay", 0.0),
        **_adam_args(kwargs),
    )


@registry.register_optimizer("LARS")
def LARS(**kwargs) -> optax.GradientTransformation:
    return optax.lars(
        _lr(kwargs),
        weight_decay=kwargs.get("weight_decay", 0.0),
        momentum=kwargs.get("momentum", 0.9),
    )


# ---------------------------------------------------------------------------
# LR schedules (torch-named, epoch-parameterised)
# ---------------------------------------------------------------------------

@registry.register_lr_scheduler("CosineAnnealingLR")
def CosineAnnealingLR(
    base_lr: float, steps_per_epoch: int, T_max: int, eta_min: float = 0.0, **_: Any,
) -> optax.Schedule:
    """Cosine annealing over T_max epochs down to eta_min, then flat
    (torch semantics restrict to the first period; we hold at eta_min)."""
    decay_steps = max(int(T_max * steps_per_epoch), 1)
    alpha = eta_min / base_lr if base_lr > 0 else 0.0
    cos = optax.cosine_decay_schedule(base_lr, decay_steps, alpha=alpha)

    def schedule(step):
        import jax.numpy as jnp

        return cos(jnp.minimum(step, decay_steps))

    return schedule


@registry.register_lr_scheduler("StepLR")
def StepLR(
    base_lr: float, steps_per_epoch: int, step_size: int, gamma: float = 0.1, **_: Any,
) -> optax.Schedule:
    return optax.exponential_decay(
        base_lr,
        transition_steps=max(int(step_size * steps_per_epoch), 1),
        decay_rate=gamma,
        staircase=True,
    )


@registry.register_lr_scheduler("ExponentialLR")
def ExponentialLR(
    base_lr: float, steps_per_epoch: int, gamma: float = 0.95, **_: Any,
) -> optax.Schedule:
    return optax.exponential_decay(
        base_lr,
        transition_steps=max(int(steps_per_epoch), 1),
        decay_rate=gamma,
        staircase=True,
    )


@registry.register_lr_scheduler("LinearLR")
def LinearLR(
    base_lr: float,
    steps_per_epoch: int,
    start_factor: float = 1.0 / 3.0,
    end_factor: float = 1.0,
    total_iters: int = 5,
    **_: Any,
) -> optax.Schedule:
    return optax.linear_schedule(
        base_lr * start_factor,
        base_lr * end_factor,
        max(int(total_iters * steps_per_epoch), 1),
    )


@registry.register_lr_scheduler("MultiStepLR")
def MultiStepLR(
    base_lr: float,
    steps_per_epoch: int,
    milestones: list,
    gamma: float = 0.1,
    **_: Any,
) -> optax.Schedule:
    """torch.optim.lr_scheduler.MultiStepLR: multiply by gamma at each
    milestone epoch. Milestones that collapse to the same step (duplicates,
    or sub-epoch fractions truncating together) compound as gamma**count,
    matching torch's per-milestone application."""
    from collections import Counter

    counts = Counter(int(m * steps_per_epoch) for m in milestones)
    boundaries = {step: gamma ** n for step, n in sorted(counts.items())}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


@registry.register_lr_scheduler("ConstantLR")
def ConstantLR(
    base_lr: float,
    steps_per_epoch: int,
    factor: float = 1.0 / 3.0,
    total_iters: int = 5,
    **_: Any,
) -> optax.Schedule:
    """torch ConstantLR: base_lr*factor for total_iters epochs, then base_lr."""
    switch = max(int(total_iters * steps_per_epoch), 1)
    return optax.join_schedules(
        [optax.constant_schedule(base_lr * factor),
         optax.constant_schedule(base_lr)],
        [switch],
    )


@registry.register_lr_scheduler("PolynomialLR")
def PolynomialLR(
    base_lr: float,
    steps_per_epoch: int,
    total_iters: int = 5,
    power: float = 1.0,
    **_: Any,
) -> optax.Schedule:
    return optax.polynomial_schedule(
        base_lr, 0.0, power, max(int(total_iters * steps_per_epoch), 1),
    )


@registry.register_lr_scheduler("CosineAnnealingWarmRestarts")
def CosineAnnealingWarmRestarts(
    base_lr: float,
    steps_per_epoch: int,
    T_0: int,
    T_mult: int = 1,
    eta_min: float = 0.0,
    **_: Any,
) -> optax.Schedule:
    """torch SGDR: cosine periods of T_0, T_0*T_mult, ... epochs,
    restarting indefinitely (closed form — no finite restart table, so a
    long run never decays to a frozen eta_min).

    T_mult == 1: t_cur = step mod T_0.  T_mult > 1: the cycle index is
    n = floor(log_Tmult(step/T_0*(T_mult-1) + 1)) with cycle start
    T_0*(T_mult^n - 1)/(T_mult - 1), matching
    torch.optim.lr_scheduler.CosineAnnealingWarmRestarts.
    """
    import jax.numpy as jnp

    period = max(int(T_0 * steps_per_epoch), 1)
    mult = max(int(T_mult), 1)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        if mult == 1:
            t_cur = jnp.mod(s, period)
            T_i = float(period)
        else:
            n = jnp.floor(
                jnp.log(s / period * (mult - 1) + 1.0) / jnp.log(float(mult)),
            )
            # float32 log/floor can land one cycle low exactly at a restart
            # boundary; bump n when the residual already spans the cycle
            start = period * (mult ** n - 1.0) / (mult - 1.0)
            T_i = period * mult ** n
            n = jnp.where(s - start >= T_i, n + 1.0, n)
            start = period * (mult ** n - 1.0) / (mult - 1.0)
            T_i = period * mult ** n
            t_cur = s - start
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * t_cur / T_i)
        )

    return schedule


@registry.register_lr_scheduler("OneCycleLR")
def OneCycleLR(
    base_lr: float,
    steps_per_epoch: int,
    max_lr: float,
    total_steps: int = 0,
    epochs: int = 0,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
    **_: Any,
) -> optax.Schedule:
    """torch OneCycleLR (cosine annealing strategy)."""
    total = int(total_steps) or max(int(epochs * steps_per_epoch), 1)
    up = max(int(total * pct_start), 1)
    init = max_lr / div_factor
    final = init / final_div_factor
    return optax.join_schedules(
        [
            optax.linear_schedule(init, max_lr, up),
            optax.cosine_decay_schedule(
                max_lr, max(total - up, 1), alpha=final / max_lr,
            ),
        ],
        [up],
    )


def build_lr_schedule(
    name: Optional[str],
    base_lr: float,
    steps_per_epoch: int,
    kwargs: Optional[dict] = None,
) -> float | optax.Schedule:
    """Resolve an lr_scheduler config entry into an optax schedule (or the
    constant base_lr when no scheduler is configured)."""
    if not name:
        return base_lr
    factory = registry.get("lr_schedulers", name)
    return factory(base_lr=base_lr, steps_per_epoch=steps_per_epoch, **(kwargs or {}))


def build_optimizer(
    name: Optional[str],
    opt_kwargs: Optional[dict] = None,
    learning_rate: Optional[Any] = None,
    world_size: int = 1,
    clip_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Construct the full gradient transformation.

    * lr is scaled by sqrt(world_size) for data-parallel training, matching
      the reference (abstract_diffusion.py:104-119);
    * optional global-norm clipping (the reference's diffusers pipeline clips
      to 1.0 inline, diffusers.py:125-134).
    """
    import math

    opt_kwargs = dict(opt_kwargs or {})
    name = name or "AdamW"
    if learning_rate is not None:
        opt_kwargs["learning_rate"] = learning_rate
        opt_kwargs.pop("lr", None)
    scale = math.sqrt(world_size)
    if scale != 1.0:
        lr = opt_kwargs.get("learning_rate", opt_kwargs.get("lr"))
        if lr is None:
            # No lr in the config: leave the optimizer factory's own default
            # in force rather than fabricating one — injecting e.g. 1e-3
            # would silently override Adafactor's learning_rate=None rule
            # (and Adamax/NAdam/RMSprop's different defaults) the moment the
            # device count changes. The sqrt(world_size) scaling only
            # applies to an EXPLICIT lr.
            pass
        elif callable(lr):
            base = lr
            opt_kwargs["learning_rate"] = lambda step: base(step) * scale
        else:
            opt_kwargs["learning_rate"] = lr * scale
    tx = registry.get("optimizers", name)(**opt_kwargs)
    if clip_grad_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    return tx
