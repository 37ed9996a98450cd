"""Bottleneck isolation for the Pallas conv3d kernel at the level-1 shape.

Variants:
  full      — the real kernel (DMA + 9 patch builds + 9 dots)
  nopatch   — DMA + 9 dots on ONE fixed patch (bounds patch-build cost)
  nodma     — garbage slab (no DMA) + 9 patch builds + 9 dots
  dotsonly  — 9 dots on a VMEM-resident patch input (pure MXU bound)

Usage: python benchmarks/conv3d_variants.py [variant ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, D, H, W, CIN, COUT = 32, 32, 16, 16, 128, 128
TD, TC = 8, 128
CPAD = 384
M = TD * H * W
PEAK = 197.0
FLOPS = 2 * B * D * H * W * CIN * COUT * 27


def timeit(fn, *args, iters=20, reps=3):
    @jax.jit
    def run(a):
        def body(i, a):
            return fn(a, *args[1:])
        return jax.lax.fori_loop(0, iters, body, a)

    a = run(args[0])
    jax.block_until_ready(a)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(a))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def make_conv(variant):
    def kern(xw_ref, km_ref, out_ref, slab_ref, sem):
        b = pl.program_id(0)
        dt = pl.program_id(2)
        if variant != "nodma":
            cp = pltpu.make_async_copy(
                xw_ref.at[b, pl.ds(dt * TD, TD + 2)], slab_ref, sem,
            )
            cp.start()
            cp.wait()
        acc = jnp.zeros((M, TC), jnp.float32)
        for dzy in range(9):
            dz, dy = dzy // 3, dzy % 3
            if variant == "nopatch":
                patch = slab_ref[0:TD, 0:H, :, :].reshape(M, CPAD)
            else:
                patch = slab_ref[dz:dz + TD, dy:dy + H, :, :].reshape(M, CPAD)
            krows = km_ref[dzy * CPAD:(dzy + 1) * CPAD, :]
            acc += jnp.dot(patch, krows, preferred_element_type=jnp.float32)
        out_ref[...] = acc.reshape(1, TD, H, W, TC).astype(out_ref.dtype)

    def conv(x, km):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        xw = jnp.concatenate(
            [xp[:, :, :, dx:dx + W, :] for dx in range(3)], axis=-1,
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, D, H, W, COUT), x.dtype),
            grid=(B, COUT // TC, D // TD),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((9 * CPAD, TC), lambda bb, ct, dt: (0, ct),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, TD, H, W, TC), lambda bb, ct, dt: (bb, dt, 0, 0, ct),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((TD + 2, H + 2, W, CPAD), x.dtype),
                pltpu.SemaphoreType.DMA,
            ],
        )(xw, km)

    return conv


def make_bigdot(td):
    """Build the full [M', 9*CPAD] patch in VMEM scratch (9 stores), then
    ONE dot — K-accumulation stays inside the MXU instead of 9 VPU
    read-modify-writes of the f32 accumulator."""
    mm = td * H * W

    def kern(xw_ref, km_ref, out_ref, slab_ref, patch_ref, sem):
        b = pl.program_id(0)
        dt = pl.program_id(2)
        cp = pltpu.make_async_copy(
            xw_ref.at[b, pl.ds(dt * td, td + 2)], slab_ref, sem,
        )
        cp.start()
        cp.wait()
        for dzy in range(9):
            dz, dy = dzy // 3, dzy % 3
            patch_ref[:, dzy * CPAD:(dzy + 1) * CPAD] = (
                slab_ref[dz:dz + td, dy:dy + H, :, :].reshape(mm, CPAD)
            )
        out = jnp.dot(
            patch_ref[...], km_ref[...], preferred_element_type=jnp.float32,
        )
        out_ref[...] = out.reshape(1, td, H, W, TC).astype(out_ref.dtype)

    def conv(x, km):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        xw = jnp.concatenate(
            [xp[:, :, :, dx:dx + W, :] for dx in range(3)], axis=-1,
        )
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((B, D, H, W, COUT), x.dtype),
            grid=(B, COUT // TC, D // td),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((9 * CPAD, TC), lambda bb, ct, dt: (0, ct),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, td, H, W, TC), lambda bb, ct, dt: (bb, dt, 0, 0, ct),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((td + 2, H + 2, W, CPAD), x.dtype),
                pltpu.VMEM((mm, 9 * CPAD), x.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(xw, km)

    return conv


def dots_only():
    def kern(p_ref, km_ref, out_ref):
        acc = jnp.zeros((M, TC), jnp.float32)
        for dzy in range(9):
            acc += jnp.dot(
                p_ref[...], km_ref[dzy * CPAD:(dzy + 1) * CPAD, :],
                preferred_element_type=jnp.float32,
            )
        out_ref[...] = acc.astype(out_ref.dtype)

    n_steps = B * (D // TD)

    def run(p, km):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n_steps, M, TC), p.dtype),
            grid=(n_steps,),
            in_specs=[
                pl.BlockSpec((1, M, CPAD), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * CPAD, TC), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, M, TC), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(p.reshape(n_steps, M, CPAD)[:, 0:M], km)

    return run


def main():
    variants = sys.argv[1:] or ["full", "nopatch", "nodma", "dotsonly"]
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, H, W, CIN), jnp.bfloat16) * 0.1
    km = jax.random.normal(key, (9 * CPAD, COUT), jnp.bfloat16) * 0.02
    print(f"backend={jax.default_backend()}", flush=True)
    for v in variants:
        if v == "dotsonly":
            fn = dots_only()
            p = jax.random.normal(
                key, (B * (D // TD) * M, CPAD), jnp.bfloat16,
            ) * 0.1

            back = jax.random.normal(key, (TC, CPAD), jnp.bfloat16) * 0.01

            def step(p, km=km, fn=fn, back=back):
                o = fn(p, km).reshape(p.shape[0], TC)
                return p + 0.001 * (o @ back).astype(p.dtype)

            t = timeit(step, p)
        elif v.startswith("bigdot"):
            td = int(v[6:]) if len(v) > 6 else 4
            conv = make_bigdot(td)

            def step(x, conv=conv):
                return x + 0.001 * conv(x, km).astype(x.dtype)

            t = timeit(step, x)
        else:
            conv = make_conv(v)

            def step(x, conv=conv):
                return x + 0.001 * conv(x, km).astype(x.dtype)

            t = timeit(step, x)
        print(
            f"{v:>9}: {t*1e3:6.2f} ms  ({FLOPS/t/1e12:5.1f} TF/s, "
            f"{FLOPS/t/1e12/PEAK:4.0%})",
            flush=True,
        )


if __name__ == "__main__":
    main()
