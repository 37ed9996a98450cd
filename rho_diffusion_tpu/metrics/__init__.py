from rho_diffusion_tpu.metrics.losses import (  # noqa: F401
    discretized_gaussian_log_likelihood,
    normal_kl,
    psnr,
    resolve_loss,
)
from rho_diffusion_tpu.metrics.geom import WassersteinWrapper, sinkhorn_divergence  # noqa: F401
from rho_diffusion_tpu.metrics.spectral import comb_metrics, peak_stats  # noqa: F401
