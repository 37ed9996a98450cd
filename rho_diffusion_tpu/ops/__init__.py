from rho_diffusion_tpu.ops.activations import resolve_activation, symmetric_log  # noqa: F401
from rho_diffusion_tpu.ops.attention import attention, xla_attention  # noqa: F401
from rho_diffusion_tpu.ops.convolution import (  # noqa: F401
    Downsample,
    Upsample,
    avg_pool_nd,
    conv_nd,
    mean_flat,
)
from rho_diffusion_tpu.ops.embeddings import sinusoidal_position_embedding  # noqa: F401
from rho_diffusion_tpu.ops.norm import GroupNorm32, RMSNorm  # noqa: F401
