"""DiffusersDDPMPipeline — parity shim for the reference's HuggingFace
diffusers-backed pipeline (/root/reference/rho_diffusion/diffusion/
diffusers.py:13-310).

The reference delegated schedule math to a ``diffusers.DDPMScheduler``
configured by scripts/training.py:86-95 as: squaredcos_cap_v2 betas,
epsilon prediction, fixed_large variance, plus an inline grad-norm clip to
1.0 (diffusers.py:125-134). That is exactly a GaussianDiffusionPipeline
configuration, so this subclass pins those defaults instead of importing
the diffusers package. ``prediction_type`` switches the training target the
same way the reference's training_step did ('epsilon' / 'sample',
diffusers.py:106-123).
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


class DiffusersDDPMPipeline(GaussianDiffusionPipeline):
    def __init__(
        self,
        backbone,
        backbone_kwargs: dict[str, Any],
        schedule: Optional[NoiseSchedule] = None,
        timesteps: Optional[int] = None,
        prediction_type: str = "epsilon",
        beta_schedule: str = "squaredcos_cap_v2",
        clip_grad_norm: float = 1.0,
        **kwargs,
    ) -> None:
        if schedule is None:
            schedule = named_beta_schedule(beta_schedule, timesteps or 1000)
        mean_type = (
            ModelMeanType.EPSILON
            if prediction_type == "epsilon"
            else ModelMeanType.START_X
        )
        kwargs.setdefault("model_var_type", ModelVarType.FIXED_LARGE)
        kwargs.setdefault("loss_type", LossType.MSE)
        super().__init__(
            backbone=backbone,
            backbone_kwargs=backbone_kwargs,
            schedule=schedule,
            timesteps=timesteps,
            model_mean_type=mean_type,
            clip_grad_norm=clip_grad_norm,
            **kwargs,
        )
