"""DiffusersDDPMPipeline — parity for the reference's HuggingFace
diffusers-backed pipeline (/root/reference/rho_diffusion/diffusion/
diffusers.py:13-310).

The reference delegated schedule math to an arbitrary
``diffusers.SchedulerMixin`` (diffusers.py:148-216) and dispatched the
training target on ``schedule.config.prediction_type`` (:106-134). Rather
than importing the diffusers package, this subclass maps the DDPMScheduler
configuration surface onto the GaussianDiffusionPipeline:

* ``beta_schedule``: "linear" | "scaled_linear" | "squaredcos_cap_v2" |
  "sigmoid" (+ ``beta_start``/``beta_end``/``num_train_timesteps``), all
  built by :func:`named_beta_schedule`;
* ``prediction_type``: "epsilon" | "sample" | "v_prediction" — the full set
  the reference's training_step switch could receive (v_prediction is a
  first-class ModelMeanType here);
* ``variance_type``: "fixed_small(_log)" | "fixed_large(_log)" |
  "learned" | "learned_range";
* ``clip_sample`` / inline grad-norm clip to 1.0 (diffusers.py:125-134);
* ``rescale_betas_zero_snr``: Lin et al. (arXiv:2305.08891) zero-terminal-
  SNR rescale — pairs with prediction_type="v_prediction"; sampling then
  defaults to trailing spacing and DDIM NaN-free at alpha_bar_T == 0.

The reference scripts' configuration (squaredcos_cap_v2 / epsilon /
fixed_large, scripts/training.py:86-95) remains the default.
"""
from __future__ import annotations

from typing import Any, Optional

from rho_diffusion_tpu.diffusion.gaussian import (
    GaussianDiffusionPipeline,
    LossType,
    ModelMeanType,
    ModelVarType,
)
from rho_diffusion_tpu.diffusion.schedule import NoiseSchedule, named_beta_schedule

_PREDICTION_TYPES = {
    "epsilon": ModelMeanType.EPSILON,
    "sample": ModelMeanType.START_X,
    "v_prediction": ModelMeanType.VELOCITY,
}

_VARIANCE_TYPES = {
    "fixed_small": ModelVarType.FIXED_SMALL,
    "fixed_small_log": ModelVarType.FIXED_SMALL,
    "fixed_large": ModelVarType.FIXED_LARGE,
    "fixed_large_log": ModelVarType.FIXED_LARGE,
    "learned": ModelVarType.LEARNED,
    "learned_range": ModelVarType.LEARNED_RANGE,
}


class DiffusersDDPMPipeline(GaussianDiffusionPipeline):
    def __init__(
        self,
        backbone,
        backbone_kwargs: dict[str, Any],
        schedule: Optional[NoiseSchedule] = None,
        timesteps: Optional[int] = None,
        num_train_timesteps: Optional[int] = None,
        prediction_type: str = "epsilon",
        beta_schedule: str = "squaredcos_cap_v2",
        beta_start: Optional[float] = None,
        beta_end: Optional[float] = None,
        variance_type: str = "fixed_large",
        clip_sample: bool = True,
        clip_grad_norm: float = 1.0,
        rescale_betas_zero_snr: bool = False,
        **kwargs,
    ) -> None:
        # T stays None when the caller supplied a ready schedule without an
        # explicit count — the base class then infers len(schedule), so an
        # injected 500-step config schedule never trains with t drawn from
        # [0, 1000) against a 500-row table.
        T = timesteps or num_train_timesteps
        if schedule is None:
            # HF DDPMScheduler semantics: explicit (un-rescaled) beta range,
            # default [0.0001, 0.02] — unlike guided-diffusion's 1000/T
            # rescale (named_beta_schedule's bare "linear")
            if beta_schedule in ("linear", "scaled_linear", "sigmoid"):
                beta_start = 0.0001 if beta_start is None else beta_start
                beta_end = 0.02 if beta_end is None else beta_end
            elif beta_start is not None or beta_end is not None:
                import warnings

                warnings.warn(
                    f"beta_start/beta_end are ignored by the "
                    f"'{beta_schedule}' schedule (same as HF DDPMScheduler)",
                    stacklevel=2,
                )
            schedule = named_beta_schedule(
                beta_schedule, T or 1000, beta_start=beta_start, beta_end=beta_end,
                zero_terminal_snr=rescale_betas_zero_snr,
            )
        elif rescale_betas_zero_snr:
            raise ValueError(
                "rescale_betas_zero_snr requires building the schedule here "
                "(float64 rescale before table construction) — pass "
                "beta_schedule/beta_start/beta_end instead of a ready "
                "schedule object",
            )
        if prediction_type not in _PREDICTION_TYPES:
            raise ValueError(
                f"unknown prediction_type '{prediction_type}'; "
                f"expected one of {sorted(_PREDICTION_TYPES)}",
            )
        if variance_type not in _VARIANCE_TYPES:
            raise ValueError(
                f"unknown variance_type '{variance_type}'; "
                f"expected one of {sorted(_VARIANCE_TYPES)}",
            )
        kwargs.setdefault("model_var_type", _VARIANCE_TYPES[variance_type])
        kwargs.setdefault("loss_type", LossType.MSE)
        kwargs.setdefault("clip_denoised", clip_sample)
        super().__init__(
            backbone=backbone,
            backbone_kwargs=backbone_kwargs,
            schedule=schedule,
            timesteps=T,
            model_mean_type=_PREDICTION_TYPES[prediction_type],
            clip_grad_norm=clip_grad_norm,
            **kwargs,
        )
