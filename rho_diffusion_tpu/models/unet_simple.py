"""The simple baseline UNet ("UNet" v1).

Re-design of /root/reference/rho_diffusion/models/unet.py:28-269 in flax,
channels-LAST, dims-generic. Faithful to the reference's (idiosyncratic)
architecture:

* every block runs at FULL spatial resolution (all convs stride 1 — the
  reference never actually down/upsamples space, only channels);
* block = conv -> act -> conv(+transpose on the up path) -> act, optional
  residual conv from the block input, ADDITIVE time-embedding readout
  (Dense(time_dim -> C)), GroupNorm(8) then activation;
* down path stores skips; up path consumes concat([x, skip]);
* 1x1 output conv, NO zero-init (unlike UNetv2), no attention, no
  conditioning.

Conscious fix (SURVEY.md hard-parts #3): the reference's time-embedding
broadcast appended exactly two trailing dims (unet.py:129-131), silently
wrong for its own 3D block; we broadcast across however many spatial dims
the data has.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from rho_diffusion_tpu.ops.activations import resolve_activation
from rho_diffusion_tpu.ops.convolution import conv_nd
from rho_diffusion_tpu.ops.embeddings import sinusoidal_position_embedding
from rho_diffusion_tpu.registry import registry


class UNetBlock(nn.Module):
    """Two-conv block with additive time embedding
    (reference AbstractUNetBlock, unet.py:28-136)."""

    out_channels: int
    dims: int
    is_up: bool = False
    kernel_size: int = 3
    groups: int = 8
    activation: Any = "GELU"
    residual: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_pe: jnp.ndarray) -> jnp.ndarray:
        act = resolve_activation(self.activation)
        h = act(conv_nd(self.dims, self.out_channels, self.kernel_size,
                        dtype=self.dtype, name="conv1")(x))
        if self.is_up:
            # stride-1 transpose conv == same-resolution conv (reference
            # passes stride=1 everywhere, unet.py:63-71)
            h = act(nn.ConvTranspose(
                self.out_channels, (self.kernel_size,) * self.dims,
                padding="SAME", dtype=self.dtype, param_dtype=jnp.float32,
                name="conv2",
            )(h))
        else:
            h = act(conv_nd(self.dims, self.out_channels, self.kernel_size,
                            dtype=self.dtype, name="conv2")(h))
        if self.residual:
            h = h + conv_nd(self.dims, self.out_channels, self.kernel_size,
                            dtype=self.dtype, name="residual_conv")(x)
        t_out = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=jnp.float32, name="time_readout")(time_pe)
        h = h + t_out.reshape(t_out.shape[0], *(1,) * self.dims, -1).astype(h.dtype)
        if self.groups:
            h = h.astype(jnp.float32)
            h = nn.GroupNorm(num_groups=min(self.groups, h.shape[-1]),
                             name="norm")(h).astype(x.dtype)
        return act(h)


registry.add("layers", "UNetBlock2d", UNetBlock)
registry.add("layers", "UNetBlock3d", UNetBlock)


@registry.register_model("UNet")
class SimpleUNet(nn.Module):
    """Baseline UNet, kwargs-compatible with the reference "UNet"
    (unet.py:151-269)."""

    input_channels: int
    block_type: str = "UNetBlock2d"
    down_channels: Sequence[int] = (64, 128, 256)
    up_channels: Sequence[int] = (256, 128, 64)
    time_embedding_dim: int = 32
    kernel_size: int = 3
    padding: int = 1  # accepted for parity; SAME padding is used
    activation: Any = "ReLU"
    residual: bool = True
    dims: Optional[int] = None  # overrides block_type-derived dimensionality
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        del y, train  # the baseline UNet is unconditional (unet.py:238-269)
        dims = self.dims or (3 if "3d" in str(self.block_type) else 2)
        time_pe = sinusoidal_position_embedding(t, self.time_embedding_dim)
        time_pe = nn.Dense(self.time_embedding_dim, param_dtype=jnp.float32,
                           name="time_mlp")(time_pe)

        h = conv_nd(dims, self.down_channels[0], 3, dtype=self.dtype,
                    name="input_conv")(x.astype(self.dtype))
        skips = []
        for i in range(len(self.down_channels) - 1):
            h = UNetBlock(
                out_channels=self.down_channels[i + 1], dims=dims,
                kernel_size=self.kernel_size, activation=self.activation,
                residual=self.residual, dtype=self.dtype, name=f"down_{i}",
            )(h, time_pe)
            skips.append(h)
        for i in range(len(self.up_channels) - 1):
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = UNetBlock(
                out_channels=self.up_channels[i + 1], dims=dims, is_up=True,
                kernel_size=self.kernel_size, activation=self.activation,
                residual=self.residual, dtype=self.dtype, name=f"up_{i}",
            )(h, time_pe)
        h = h.astype(jnp.float32)
        return nn.Dense(self.input_channels, param_dtype=jnp.float32,
                        name="output_conv")(h)
