"""rho_diffusion_tpu — a TPU-native framework for conditional density-field
diffusion.

A from-scratch JAX/XLA/Pallas re-design with the full capability surface of
intel/rho-diffusion (reference mounted at /root/reference): DDPM/DDIM
denoising diffusion with n-dimensional (1D/2D/3D) UNet and ViT backbones,
physics-parameter conditioning, JSON-config + registry-driven construction,
and SPMD data-parallel training over TPU meshes.

Importing the package populates the registry with all built-in components
(mirrors the reference's prepopulation, registry.py:160-203).
"""
from __future__ import annotations

__version__ = "0.1.0"

from rho_diffusion_tpu.registry import registry  # noqa: F401

# Populate the registry: importing these modules registers every component.
from rho_diffusion_tpu.ops import activations as _activations  # noqa: F401
from rho_diffusion_tpu.ops import embeddings as _embeddings  # noqa: F401
from rho_diffusion_tpu.metrics import geom as _geom  # noqa: F401
from rho_diffusion_tpu.metrics import losses as _losses  # noqa: F401
from rho_diffusion_tpu.training import optimizers as _optimizers  # noqa: F401
from rho_diffusion_tpu.diffusion import schedule as _schedule  # noqa: F401
from rho_diffusion_tpu.models import conditioning as _conditioning  # noqa: F401
from rho_diffusion_tpu.models import unet as _unet  # noqa: F401
from rho_diffusion_tpu.models import unet_diffusers_compat as _unet_dc  # noqa: F401
from rho_diffusion_tpu.models import unet_simple as _unet_simple  # noqa: F401
from rho_diffusion_tpu.models import vit as _vit  # noqa: F401
from rho_diffusion_tpu.data import deep_galaxy as _deep_galaxy  # noqa: F401
from rho_diffusion_tpu.data import spectroscopy as _spectroscopy  # noqa: F401
from rho_diffusion_tpu.data import synthetic as _synthetic  # noqa: F401
from rho_diffusion_tpu.data import wrappers as _wrappers  # noqa: F401

from rho_diffusion_tpu.config import ExperimentConfig  # noqa: F401
