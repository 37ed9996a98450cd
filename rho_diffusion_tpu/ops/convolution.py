"""Dimension-generic convolution / pooling / resampling primitives.

TPU-native equivalents of the reference's conv_nd / avg_pool_nd switches
(/root/reference/rho_diffusion/layers.py:77-102) and the UNet's
Upsample/Downsample blocks (unet_v2.py:103-169). Everything is
channels-LAST ([B, *spatial, C]) so the channel axis lands on the TPU lane
dimension and convs lower onto the MXU; ``flax.linen.Conv`` dispatches to
``lax.conv_general_dilated`` which is rank-generic, so no 1d/2d/3d switch is
needed.

Semantics preserved from the reference:
* zero-initialised output convs (``zero_module``, layers.py:113-119) via
  ``zeros`` kernel/bias init;
* 3D up/downsampling touches only the inner two spatial dims
  (unet_v2.py:124-129, 153).
"""
from __future__ import annotations

import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


# see Conv3dVia2d below; toggled via env RHO_CONV3D_VIA_2D=1 (read at import)
CONV3D_VIA_2D = os.environ.get("RHO_CONV3D_VIA_2D") == "1"

# Pallas 3-D conv kernel (ops/pallas/conv3d.py) for stride-1 SAME 3x3x3
# convs on TPU. "auto" uses it whenever the backend is TPU; "1" forces it
# (interpret-mode off-TPU would be slow — tests call conv3d directly);
# "0" disables. Default OFF until the kernel beats XLA end-to-end
# (benchmarks/conv3d_ab.py tracks the A/B). Runtime: set_conv3d_backend.
_CONV3D_PALLAS_MODE = os.environ.get("RHO_CONV3D_PALLAS", "0")


def set_conv3d_backend(mode: str) -> None:
    """Select the 3-D conv backend: "auto" (Pallas on TPU), "0" (XLA),
    "1" (force Pallas)."""
    global _CONV3D_PALLAS_MODE
    assert mode in ("auto", "0", "1")
    _CONV3D_PALLAS_MODE = mode


def _use_pallas_conv3d() -> bool:
    if _CONV3D_PALLAS_MODE == "1":
        return True
    if _CONV3D_PALLAS_MODE == "auto":
        try:
            return jax.default_backend() == "tpu"
        except RuntimeError:
            return False
    return False


def conv_nd(
    dims: int,
    features: int,
    kernel_size: int = 3,
    stride: int | Sequence[int] = 1,
    padding: str | int = "SAME",
    zero_init: bool = False,
    dtype=None,
    name: str | None = None,
) -> nn.Conv:
    """An n-dimensional convolution (reference layers.py:77-88).

    ``padding='SAME'`` corresponds to the reference's padding=k//2 for odd k.
    For stride 1 the two are identical, and "SAME" is kept as-is so that
    even kernel sizes stay shape-preserving (torch cannot express that
    case at all: n + 2p - k + 1 == n has no integer p for even k). For
    STRIDED convs XLA's "SAME" splits the total padding as
    (total//2, total-total//2), which on even-sized inputs gives (0, 1) —
    a one-pixel shift versus torch's symmetric k//2 padding (reference
    Downsample, unet_v2.py:153-162) — so there we lower to the explicit
    symmetric form.
    """
    if isinstance(stride, int):
        stride = (stride,) * dims
    from rho_diffusion_tpu.ops.quant import ConvInt8, get_conv_quant

    if get_conv_quant() == "int8":
        # W8A8 inference on the int8 MXU (2x bf16 peak; ops/quant.py).
        # Same param layout as nn.Conv — checkpoints load unchanged.
        # Checked BEFORE the Pallas/via-2d backends: quantization is an
        # explicit execution-mode request and must win over the float
        # backend selection, or `quantize='int8'` would silently run bf16
        # on exactly the stride-1 3x3x3 convs it targets.
        pad = padding
        if pad == "SAME" and any(s != 1 for s in stride):
            pad = (kernel_size - 1) // 2
        if isinstance(pad, int):
            pad = [(pad, pad)] * dims
        return ConvInt8(
            features=features, kernel_size=(kernel_size,) * dims,
            strides=tuple(stride), padding=pad, zero_init=zero_init,
            dtype=dtype, name=name,
        )
    if (
        dims == 3
        and kernel_size == 3
        and tuple(stride) == (1, 1, 1)
        and padding == "SAME"
        and _use_pallas_conv3d()
    ):
        return Conv3dPallas(
            features=features, zero_init=zero_init, dtype=dtype, name=name,
        )
    if CONV3D_VIA_2D and dims == 3 and kernel_size == 3 and stride[0] == 1 \
            and padding == "SAME":
        return Conv3dVia2d(
            features=features, strides=tuple(stride), zero_init=zero_init,
            dtype=dtype, name=name,
        )
    if padding == "SAME" and any(s != 1 for s in stride):
        padding = (kernel_size - 1) // 2
    if isinstance(padding, int):
        padding = [(padding, padding)] * dims
    kwargs = {}
    if zero_init:
        kwargs["kernel_init"] = nn.initializers.zeros
        kwargs["bias_init"] = nn.initializers.zeros
    return nn.Conv(
        features=features,
        kernel_size=(kernel_size,) * dims,
        strides=tuple(stride),
        padding=padding,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
        **kwargs,
    )


def avg_pool_nd(
    x: jnp.ndarray,
    dims: int,
    window: int | Sequence[int],
    stride: int | Sequence[int] | None = None,
) -> jnp.ndarray:
    """n-dimensional average pooling over [B, *spatial, C]
    (reference layers.py:91-102)."""
    if isinstance(window, int):
        window = (window,) * dims
    if stride is None:
        stride = window
    elif isinstance(stride, int):
        stride = (stride,) * dims
    return nn.avg_pool(x, tuple(window), strides=tuple(stride), padding="VALID")


def _resample_factors(dims: int) -> tuple[int, ...]:
    """Per-spatial-dim resampling factor. 3D resamples only the inner two
    dims (reference unet_v2.py:124-129, 153)."""
    if dims == 3:
        return (1, 2, 2)
    return (2,) * dims


def upsample_nearest(x: jnp.ndarray, dims: int) -> jnp.ndarray:
    """Nearest-neighbour 2x upsampling (inner two dims only for 3D),
    matching F.interpolate(mode='nearest') (reference unet_v2.py:117-132).

    Implemented as jnp.repeat along each spatial axis — exact for integer
    factors and cheap on TPU (pure layout op fused by XLA).
    """
    factors = _resample_factors(dims)
    for axis, f in enumerate(factors, start=1):
        if f > 1:
            x = jnp.repeat(x, f, axis=axis)
    return x


class Upsample(nn.Module):
    """2x nearest upsample with optional 3x3 conv (reference unet_v2.py:103-134)."""

    dims: int
    use_conv: bool
    out_channels: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = upsample_nearest(x, self.dims)
        if self.use_conv:
            x = conv_nd(
                self.dims,
                self.out_channels or x.shape[-1],
                3,
                dtype=self.dtype,
                name="conv",
            )(x)
        return x


class Downsample(nn.Module):
    """2x downsample via strided conv or average pooling
    (reference unet_v2.py:137-169). 3D strides are (1, 2, 2)."""

    dims: int
    use_conv: bool
    out_channels: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = _resample_factors(self.dims)
        if self.use_conv:
            return conv_nd(
                self.dims,
                self.out_channels or x.shape[-1],
                3,
                stride=stride,
                dtype=self.dtype,
                name="op",
            )(x)
        assert self.out_channels in (None, x.shape[-1])
        return avg_pool_nd(x, self.dims, stride, stride)


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dimensions (reference layers.py:105-110)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


class Conv3dPallas(nn.Module):
    """3x3x3 stride-1 SAME conv on the Pallas TPU kernel
    (ops/pallas/conv3d.py — im2col-in-VMEM, 3*Cin-deep MXU reductions;
    XLA's fwd conv measured 24-44% MFU at the flagship shapes).

    Parameters are stored in the standard [3,3,3,Cin,Cout] 'kernel' +
    [Cout] 'bias' layout, so checkpoints are interchangeable with nn.Conv.
    Backward: Pallas dgrad + XLA wgrad (custom VJP in the kernel module).
    """

    features: int
    zero_init: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from rho_diffusion_tpu.ops.pallas.conv3d import conv3d

        cin = x.shape[-1]
        init = (
            nn.initializers.zeros
            if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", init, (3, 3, 3, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32,
        )
        dt = self.dtype or x.dtype
        out = conv3d(x.astype(dt), kernel.astype(dt))
        return out + bias.astype(out.dtype)


class Conv3dVia2d(nn.Module):
    """3-D convolution decomposed into 3 batched 2-D convolutions.

    For kernels (3, kh, kw) with z-stride 1 (every 3-D conv in this
    framework — the UNet downsamples only the inner two dims),
        out[:, d] = sum_dz conv2d(x[:, d+dz-1], K[dz])
    with (B, D) folded into the conv2d batch. MEASURED (v5e, chained
    full-model A/B at 16^3): 0.80x native Conv3D — XLA's 3-D lowering is
    already MXU-efficient, and the decomposition costs extra HBM for the
    z-shifted copies (OOM at 32^3 b32). Kept as an opt-in alternative
    backend (env RHO_CONV3D_VIA_2D=1) and a documented negative result.
    Parameters are stored in the standard [kz, kh, kw, Cin, Cout] layout, so
    checkpoints are interchangeable with nn.Conv.
    """

    features: int
    strides: tuple = (1, 1, 1)
    zero_init: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.strides[0] == 1, "z-stride must be 1 for the 2d decomposition"
        b, d, h, w, cin = x.shape
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param("kernel", init, (3, 3, 3, cin, self.features), jnp.float32)
        bias_init = nn.initializers.zeros
        bias = self.param("bias", bias_init, (self.features,), jnp.float32)
        dt = self.dtype or x.dtype
        xk = x.astype(dt)
        kz = kernel.astype(dt)

        xp = jnp.pad(xk, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        out = None
        for dz in range(3):
            xs = xp[:, dz : dz + d].reshape(b * d, h, w, cin)
            o = jax.lax.conv_general_dilated(
                xs,
                kz[dz],
                window_strides=self.strides[1:],
                padding=((1, 1), (1, 1)),  # torch-style k//2, not XLA "SAME"
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = o if out is None else out + o
        oh, ow = out.shape[1], out.shape[2]
        out = out.reshape(b, d, oh, ow, self.features)
        return out + bias.astype(dt)
