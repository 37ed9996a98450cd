from rho_diffusion_tpu.models.conditioning import (  # noqa: F401
    ClassifierGuidance,
    FourierConditioning,
    MultiEmbeddings,
)
from rho_diffusion_tpu.models.unet import UNet  # noqa: F401
from rho_diffusion_tpu.models.unet_simple import SimpleUNet, UNetBlock  # noqa: F401
from rho_diffusion_tpu.models.vit import VisionTransformer, ViTBlock  # noqa: F401
from rho_diffusion_tpu.models.unet_diffusers_compat import UNetDiffuser  # noqa: F401
