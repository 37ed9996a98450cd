from rho_diffusion_tpu.training.ema import ema_update  # noqa: F401
from rho_diffusion_tpu.training.optimizers import build_lr_schedule, build_optimizer  # noqa: F401
from rho_diffusion_tpu.training.state import TrainState, create_train_state  # noqa: F401
from rho_diffusion_tpu.training.profiling import (  # noqa: F401
    StepTimer,
    check_finite,
    compiled_cost,
    find_nonfinite,
    trace,
)
