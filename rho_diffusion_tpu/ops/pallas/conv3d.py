"""Pallas TPU kernel: 3x3x3 channels-last 3-D convolution.

Round-1 profiling (RESULTS.md, benchmarks/conv_profile.py) found the
flagship 3D-UNet train step 82.6% `conv_general_dilated`, with XLA's
FORWARD conv at only 24-44% of v5e bf16 peak across the UNet's level shapes
(the achievable matmul ceiling is ~66%). The root cause is XLA's tap-loop
lowering: 27 accumulating matmuls whose reduction depth is only Cin, with
windowing overhead between them.

This kernel reformulates the conv as 9 matmuls of reduction depth 3*Cin:

    out[m, co] = sum_{dz,dy} P_{dz,dy}[m, 3*Cin] @ K_{dz,dy}[3*Cin, co]

The W (fastest spatial) taps are folded into the channel axis OUTSIDE the
kernel by a fused XLA pad+concat producing [B, D+2, H+2, W, 3*Cin] — a
Mosaic constraint drove this split: in-kernel W shifts are sublane-offset
relayouts ("result/input offset mismatch", "slice must be aligned to
tiling") while dz/dy shifts ride the untiled major dims for free. The
pre-fold costs one extra 3x-activation HBM write + read (~5% of the conv's
MXU time at these shapes) and buys full-depth MXU reductions.

* layout: x [B, D, H, W, C] channels-last; kernel [3, 3, 3, Cin, Cout]
  (DHWIO, identical to flax nn.Conv — checkpoint-compatible; cf. reference
  conv_nd layers.py:77-88, hot call sites unet_v2.py:215,241);
* grid (B, Cout-tiles, D-tiles), D innermost so the weight block stays
  resident in VMEM across the whole depth sweep;
* the pre-folded input stays in HBM (ANY); each program DMAs its (Td+2)
  halo slab into VMEM scratch — halo overlap between D-tiles is why a
  BlockSpec index map cannot deliver these blocks;
* f32 accumulator; output cast to the input dtype;
* stride 1, SAME padding, k=3 only (every hot conv in the UNet; strided
  downsample convs stay on XLA).

Reduction depths become 192/384/768/1536 for the flagship levels — vs
XLA's 64/128/256/512 — and each (dz, dy) step is one large matmul instead
of three windowed ones.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d", "conv3d_pallas", "conv3d_tile_plan"]

_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def _padded_fold(cin: int) -> int:
    """The folded W-tap channel depth (3*Cin), zero-padded up to a multiple
    of 128: HBM->VMEM DMA requires lane-dim alignment (Mosaic rejects e.g.
    192), and the MXU K-tiling is 128-deep anyway. Zero channels multiply
    zero weight rows, so numerics are unchanged."""
    fold = 3 * cin
    return fold if fold % 128 == 0 else (fold + 127) // 128 * 128


def conv3d_tile_plan(
    d: int, h: int, w: int, cin: int, cout: int, itemsize: int = 2,
) -> tuple[int, int]:
    """Pick (Td, Tc): D-tile and Cout-tile sizes.

    Constraints: Td | D, Tc | Cout; the double-buffered weight block
    (9*cpad*Tc) + halo slab ((Td+2)(H+2)W*cpad) + patch + f32 accumulator
    must fit VMEM. Prefer Tc >= 128 (MXU lane width), then the largest Td.
    """
    best = None
    tc_candidates = sorted(
        {256, 128, 64, 32, 16, 8, 4, 2, 1, cout}, reverse=True,
    )
    for tc in tc_candidates:
        if cout % tc:
            continue
        for td in (32, 16, 8, 4, 2, 1):
            if d % td:
                continue
            m = td * h * w
            cpad = _padded_fold(cin)
            slab = (td + 2) * (h + 2) * w * cpad * itemsize
            patch = m * cpad * itemsize
            acc = m * tc * 4
            kblk = 9 * cpad * tc * itemsize * 2  # double-buffered
            outblk = m * tc * itemsize * 2
            if slab + patch + acc + kblk + outblk <= _VMEM_BUDGET:
                cand = (td, tc)
                if best is None or (cand[1], cand[0]) > (best[1], best[0]):
                    best = cand
                break
    if best is None:
        raise ValueError(
            f"no VMEM-feasible tile plan for D={d} H={h} W={w} "
            f"Cin={cin} Cout={cout}"
        )
    return best


def _conv3d_kernel(
    xw_ref,  # [B, D+2, H+2, W, cpad] in HBM/ANY (W taps pre-folded)
    km_ref,  # [9*cpad, Tc] VMEM block of the reshaped kernel
    out_ref,  # [1, Td, H, W, Tc] VMEM block
    slab_ref,  # VMEM scratch [Td+2, H+2, W, cpad]
    sem,  # DMA semaphore
    *,
    td: int,
    h: int,
    w: int,
    cpad: int,
):
    b = pl.program_id(0)
    dt = pl.program_id(2)

    pltpu.make_async_copy(
        xw_ref.at[b, pl.ds(dt * td, td + 2)], slab_ref, sem,
    ).start()
    pltpu.make_async_copy(
        xw_ref.at[b, pl.ds(dt * td, td + 2)], slab_ref, sem,
    ).wait()

    m = td * h * w
    acc = jnp.zeros((m, out_ref.shape[-1]), jnp.float32)
    for dzy in range(9):
        dz, dy = dzy // 3, dzy % 3
        # dz/dy shifts ride the untiled major dims — no relayout
        patch = slab_ref[dz : dz + td, dy : dy + h, :, :].reshape(m, cpad)
        krows = km_ref[dzy * cpad : (dzy + 1) * cpad, :]
        acc += jnp.dot(patch, krows, preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(1, td, h, w, out_ref.shape[-1]).astype(
        out_ref.dtype,
    )


@functools.partial(
    jax.jit, static_argnames=("tile_d", "tile_cout", "interpret"),
)
def conv3d_pallas(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    tile_d: Optional[int] = None,
    tile_cout: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3x3 SAME stride-1 conv: x [B,D,H,W,Cin] -> [B,D,H,W,Cout].

    ``kernel``: [3,3,3,Cin,Cout] (DHWIO, same as flax nn.Conv). Numerics:
    bf16 inputs multiply on the MXU with f32 accumulation — same as XLA's
    conv lowering.
    """
    b, d, h, w, cin = x.shape
    assert kernel.shape[:3] == (3, 3, 3) and kernel.shape[3] == cin, (
        f"kernel {kernel.shape} does not match x {x.shape}"
    )
    cout = kernel.shape[-1]
    td, tc = conv3d_tile_plan(d, h, w, cin, cout, x.dtype.itemsize)
    if tile_d is not None:
        td = tile_d
    if tile_cout is not None:
        tc = tile_cout
    assert d % td == 0 and cout % tc == 0

    # fused XLA pre-pass: pad + fold the W taps into channels, zero-pad
    # the folded depth to a 128 multiple (DMA lane alignment)
    cpad = _padded_fold(cin)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xw = jnp.concatenate(
        [xp[:, :, :, dx : dx + w, :] for dx in range(3)], axis=-1,
    )
    if cpad != 3 * cin:
        xw = jnp.pad(xw, ((0, 0),) * 4 + ((0, cpad - 3 * cin),))
    km = kernel.reshape(9, 3 * cin, cout)
    if cpad != 3 * cin:
        km = jnp.pad(km, ((0, 0), (0, cpad - 3 * cin), (0, 0)))
    km = km.reshape(9 * cpad, cout).astype(x.dtype)

    grid = (b, cout // tc, d // td)
    out = pl.pallas_call(
        functools.partial(_conv3d_kernel, td=td, h=h, w=w, cpad=cpad),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (9 * cpad, tc),
                lambda bb, ct, dt: (0, ct),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, td, h, w, tc),
            lambda bb, ct, dt: (bb, dt, 0, 0, ct),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((td + 2, h + 2, w, cpad), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * d * h * w * cin * cout * 27,
            bytes_accessed=(
                xw.size * x.dtype.itemsize
                + km.size * x.dtype.itemsize
                + b * d * h * w * cout * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
    )(xw, km)
    return out


# ---------------------------------------------------------------------------
# Differentiable public op: Pallas forward + Pallas dgrad + XLA wgrad
# ---------------------------------------------------------------------------
def _xla_conv3d(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@jax.custom_vjp
def conv3d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Differentiable 3x3x3 SAME stride-1 conv on the Pallas kernel.

    Backward: dgrad (input cotangent) is itself a 3x3x3 stride-1 SAME conv
    with the spatially-flipped, IO-transposed kernel — it reuses the Pallas
    kernel. wgrad (kernel cotangent) is left to XLA via linear_transpose,
    where its big-GEMM lowering is already near the roofline
    (benchmarks/conv_profile.py: bwd much faster than fwd).
    """
    return conv3d_pallas(x, kernel)


def _conv3d_fwd(x, kernel):
    return conv3d_pallas(x, kernel), (x, kernel)


def _conv3d_bwd(res, g):
    x, kernel = res
    g = g.astype(x.dtype)
    # dgrad: correlation with flipped kernel, channels transposed
    k_t = jnp.flip(kernel, axis=(0, 1, 2)).swapaxes(3, 4)
    dx = conv3d_pallas(g, k_t.astype(x.dtype))
    # wgrad: transpose of the (linear-in-kernel) conv at fixed x
    dk = jax.linear_transpose(lambda k: _xla_conv3d(x, k), kernel)(g)[0]
    return dx.astype(x.dtype), dk.astype(kernel.dtype)


conv3d.defvjp(_conv3d_fwd, _conv3d_bwd)
