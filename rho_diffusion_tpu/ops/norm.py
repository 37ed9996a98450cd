"""Normalization layers with explicit float32 islands.

The reference keeps GroupNorm in fp32 regardless of the surrounding compute
dtype (GroupNorm32, /root/reference/rho_diffusion/layers.py:71-74) — that
fp32 island is load-bearing for mixed-precision stability and is reproduced
here for bfloat16 TPU compute. Layout is channels-LAST (TPU-native), i.e.
inputs are [B, *spatial, C].
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32, output cast back to the input dtype.

    Equivalent of the reference's ``normalization(ch)`` = GroupNorm(32, ch)
    in fp32 (layers.py:71-74, 122-129). ``num_groups`` falls back to the
    channel count when channels < 32 so small models remain valid.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # largest group count <= num_groups that divides the channels, so
        # small test configs stay valid (torch GroupNorm would just error)
        groups = min(self.num_groups, c)
        while c % groups:
            groups -= 1
        orig_dtype = x.dtype
        h = x.astype(jnp.float32)
        h = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(h)
        return h.astype(orig_dtype)


class RMSNorm(nn.Module):
    """Root-mean-square norm over the channel axis.

    NOTE: the reference's RMSNorm formula is idiosyncratic
    (scale = ||x||_2 * sqrt(dim), layers.py:37-68 — not a true RMS); we
    implement the standard RMSNorm (Zhang & Sennrich 2019). The reference
    never uses its RMSNorm in any model, so there is no parity risk.
    """

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        h = x.astype(jnp.float32)
        ms = jnp.mean(jnp.square(h), axis=-1, keepdims=True)
        h = h * jnp.reciprocal(jnp.sqrt(ms + self.epsilon))
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        return (h * scale).astype(orig_dtype)
