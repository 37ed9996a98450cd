from rho_diffusion_tpu.data.base import AbstractDataset, Density, MultiVariateDataset, UnivariateDataset  # noqa: F401
from rho_diffusion_tpu.data.deep_galaxy import DeepGalaxyDataset  # noqa: F401
from rho_diffusion_tpu.data.loader import DataLoader, prefetch, prefetch_to_device  # noqa: F401
from rho_diffusion_tpu.data.parameter_space import DiscreteParameterSpace  # noqa: F401
from rho_diffusion_tpu.data.spectroscopy import SpectroscopyDataset  # noqa: F401
from rho_diffusion_tpu.data.synthetic import SphericalHarmonicDataset, compute_spherical_harmonic  # noqa: F401
from rho_diffusion_tpu.data.wrappers import CIFAR10Dataset, MNISTDataset  # noqa: F401
