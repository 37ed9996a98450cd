from rho_diffusion_tpu.diffusion.base import AbstractDiffusionPipeline, extract  # noqa: F401
from rho_diffusion_tpu.diffusion.ddpm import DDPM, ddpm_reverse_step, q_sample  # noqa: F401
from rho_diffusion_tpu.diffusion.gaussian import (  # noqa: F401
    GaussianCoefficients,
    GaussianDiffusionPipeline,
    LossType,
    ModelMeanType,
    ModelVarType,
    calc_bpd_loop,
    coefficients_from_schedule,
    dynamic_threshold,
    encode_loop,
    respace,
    respace_subset,
    sample_loop,
    training_losses,
)
from rho_diffusion_tpu.diffusion.distill import (  # noqa: F401
    ProgressiveDistiller,
    distill_grid,
    distilled_coefficients,
)
from rho_diffusion_tpu.diffusion.schedule import (  # noqa: F401
    CosineBetaSchedule,
    LinearSchedule,
    NoiseSchedule,
    SigmoidSchedule,
    named_beta_schedule,
)
