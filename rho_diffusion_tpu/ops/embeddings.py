"""Positional / timestep embeddings.

Reproduces the reference's interleaved sinusoidal embedding exactly
(/root/reference/rho_diffusion/models/common.py:27-43): even indices carry
sin(t / omega_i), odd indices cos(t / omega_i) with
omega_i = wavelength^(2i/dim).
"""
from __future__ import annotations

import jax.numpy as jnp

from rho_diffusion_tpu.registry import registry


def sinusoidal_position_embedding(
    t: jnp.ndarray,
    dim: int,
    wavelength: float = 10000.0,
) -> jnp.ndarray:
    """Interleaved sin/cos timestep embedding, shape [len(t), dim], float32.

    t -> [sin(t/w_1), cos(t/w_1), sin(t/w_2), cos(t/w_2), ...]
    (reference common.py:27-43; note interleaved, not concatenated halves).
    """
    assert dim % 2 == 0, "`dim` must be divisible by 2"
    i = jnp.arange(dim // 2, dtype=jnp.float32)
    omega = jnp.power(wavelength, 2.0 * i / dim)
    args = t.astype(jnp.float32)[:, None] / omega[None, :]
    # Interleave sin/cos along the last axis: stack then reshape.
    pe = jnp.stack([jnp.sin(args), jnp.cos(args)], axis=-1)
    return pe.reshape(t.shape[0], dim)


class SinusoidalPositionEmbedding:
    """Module-style wrapper registered under the reference's layer name
    (reference common.py:46-80)."""

    def __init__(self, dim: int, wavelength: float = 10000.0) -> None:
        self.dim = dim
        self.wavelength = wavelength

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        return sinusoidal_position_embedding(t, self.dim, self.wavelength)


registry.add("layers", "SinusoidalPositionEmbedding", SinusoidalPositionEmbedding)
