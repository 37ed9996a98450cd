"""int8 inference quantization for the conv stack.

The v5e MXU runs int8 x int8 -> int32 at 394.7 TOPS — 2x the bf16 peak —
and XLA lowers integer ``conv_general_dilated`` straight onto it: measured
1.34-1.70x the bf16 convs at the flagship UNet shapes
(benchmarks/conv_int8_probe.py). Sampling is ~83% forward-conv time
(RESULTS.md roofline table), so quantized inference is a direct
serving-throughput lever the reference (fp32 torch,
/root/reference/rho_diffusion/models/unet_v2.py) has no counterpart for.

Scheme — symmetric, weight-per-output-channel, activation-per-SAMPLE
(the standard W8A8 recipe; per-channel weight scales absorb the large
inter-filter magnitude spread, the dynamic activation scale follows the
step-dependent activation range of diffusion sampling). The activation
scale deliberately does NOT reduce over the batch axis: a per-tensor
scale would make every row's numerics depend on which other rows were
co-batched, breaking the serving layer's request-determinism contract
(serving.py: bit-identical samples regardless of batching/padding).
Per-sample scales cost the same single VPU reduce.

    s_w[c] = max|W[..., c]| / 127     (loop-invariant — XLA hoists the
                                       weight quantization out of the
                                       scan-over-steps samplers)
    s_x[b] = max|x[b]| / 127          (dynamic, one VPU reduce per conv)
    y      = conv(q(x), q(W)) -> int32 on the int8 MXU
    out    = y * (s_x * s_w) + bias   (dequant fused by XLA)

Convs with fewer than ``MIN_QUANT_CHANNELS`` input or output channels run
the normal float path: the UNet's 1-channel input conv and 1-channel
output conv are quality-critical and FLOP-trivial (the usual
first/last-layer exclusion).

INFERENCE ONLY: round() has zero gradient everywhere, so the trainer
refuses to build a train step while quantization is active
(diffusion/base.py:make_train_step).

Measured guidance (RESULTS.md round 4): int8 is a BATCHED-throughput
lever (+9% volumes/s at 32^3 ddim-50, +2% at 64^3 dpm++-10, quality
neutral on the sampler-quality harness) but REGRESSES single-request
bucket-1 latency 2.6-2.7x at both grids — the per-sample scale
reductions and quant/dequant traffic dominate a batch-1 launch. Quantize
batched services; keep bf16 for latency-sensitive bucket-1 serving.

Enable via ``set_conv_quant("int8")`` / the ``conv_quant`` context manager,
env ``RHO_CONV_INT8=1``, ``scripts/inference.py --quant int8``, or
``SamplingService(quantize="int8")``. The flag is read at TRACE time —
set it before the first jit of the sampler.
"""
from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

MIN_QUANT_CHANNELS = 16

_CONV_QUANT_MODE = "int8" if os.environ.get("RHO_CONV_INT8") == "1" else "off"


def set_conv_quant(mode: str) -> None:
    """Select conv quantization: "off" (default) or "int8" (W8A8 inference).

    Takes effect at trace time: call before the sampler/service compiles.
    """
    global _CONV_QUANT_MODE
    if mode not in ("off", "int8"):
        raise ValueError(f"conv quant mode must be 'off' or 'int8', got {mode!r}")
    _CONV_QUANT_MODE = mode


def get_conv_quant() -> str:
    return _CONV_QUANT_MODE


@contextmanager
def conv_quant(mode: str):
    """Scoped ``set_conv_quant`` (for tests and one-off quantized traces)."""
    prev = _CONV_QUANT_MODE
    set_conv_quant(mode)
    try:
        yield
    finally:
        set_conv_quant(prev)


def quantize_int8(w: jnp.ndarray, axes: tuple) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 quantization of ``w`` reducing |max| over ``axes``.

    Returns (q, scale) with q int8 in [-127, 127] and w ~= q * scale.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


class ConvInt8(nn.Module):
    """n-D convolution evaluated on the int8 MXU path (W8A8).

    Parameter layout is identical to ``flax.linen.Conv``
    ([*kernel_size, Cin, Cout] 'kernel' + [Cout] 'bias'), so any checkpoint
    trained with the normal conv stack loads unchanged — quantization is a
    pure execution-mode switch, not a model change.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    padding: Any  # "SAME"/"VALID" or explicit ((lo, hi), ...) pairs
    zero_init: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dims = len(self.kernel_size)
        cin = x.shape[-1]
        init = (
            nn.initializers.zeros if self.zero_init
            else nn.initializers.lecun_normal()
        )
        kernel = self.param(
            "kernel", init, (*self.kernel_size, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32,
        )
        dt = self.dtype or x.dtype
        spatial = "DHW"[3 - dims:]
        dn = ("N" + spatial + "C", spatial + "IO", "N" + spatial + "C")

        if cin < MIN_QUANT_CHANNELS or self.features < MIN_QUANT_CHANNELS:
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt), tuple(self.strides),
                self.padding, dimension_numbers=dn,
            )
            return y + bias.astype(y.dtype)

        # weights: per-output-channel symmetric scales
        w_q, s_w = quantize_int8(kernel, axes=tuple(range(kernel.ndim - 1)))
        # activations: dynamic per-SAMPLE scale (never across the batch —
        # see module docstring: serving request-determinism contract)
        x_q, s_x = quantize_int8(x, axes=tuple(range(1, x.ndim)))
        y32 = jax.lax.conv_general_dilated(
            x_q, w_q, tuple(self.strides), self.padding,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )
        # s_x: [B, 1, ..., 1]; s_w -> [1, ..., 1, Cout]; broadcast over y32.
        scale = (s_x * s_w.reshape(-1)).astype(jnp.float32)
        y = (y32.astype(jnp.float32) * scale + bias).astype(dt)
        return y


class DenseInt8(nn.Module):
    """Dense layer evaluated on the int8 MXU path (W8A8).

    Parameter layout is identical to ``flax.linen.Dense`` ([in, out]
    'kernel' + [out] 'bias'), so checkpoints load unchanged — like
    ConvInt8, quantization is an execution-mode switch. Scales follow the
    same scheme: per-output-channel weights, per-SAMPLE activations
    (reduced over every non-batch axis, preserving the serving layer's
    request-determinism contract).
    """

    features: int
    dtype: Any = None
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init, (cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", self.bias_init, (self.features,), jnp.float32,
        )
        dt = self.dtype or x.dtype
        if cin < MIN_QUANT_CHANNELS or self.features < MIN_QUANT_CHANNELS:
            return x.astype(dt) @ kernel.astype(dt) + bias.astype(dt)
        w_q, s_w = quantize_int8(kernel, axes=(0,))  # per-output-channel
        x_q, s_x = quantize_int8(x, axes=tuple(range(1, x.ndim)))
        y32 = jax.lax.dot_general(
            x_q, w_q,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        scale = (s_x * s_w.reshape(-1)).astype(jnp.float32)
        return (y32.astype(jnp.float32) * scale + bias).astype(dt)


def dense(
    features: int,
    dtype: Any = None,
    kernel_init: Any = nn.initializers.lecun_normal(),
    bias_init: Any = nn.initializers.zeros,
    name: str | None = None,
):
    """A Dense layer that honours the active quantization mode.

    Used at the UNet's matmul-heavy Dense sites (attention qkv/proj and
    channel-mixing skips) so ``quantize='int8'`` covers them alongside the
    convs. The time-MLP Denses stay float on purpose: their FLOPs are
    O(B x emb^2) — invisible next to the conv/attention work — and they
    feed every scale-shift in the network (the usual quality-critical
    exclusion, like the 1-channel input/output convs).
    """
    if get_conv_quant() == "int8":
        return DenseInt8(
            features=features, dtype=dtype,
            kernel_init=kernel_init, bias_init=bias_init, name=name,
        )
    return nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32,
        kernel_init=kernel_init, bias_init=bias_init, name=name,
    )
