"""Per-shape conv MFU profile on the real TPU chip.

Round-1 found the flagship train step 82.6% conv_general_dilated at ~53% of
v5e bf16 peak (RESULTS.md). Before building the Pallas 3-D conv kernel this
measures WHERE XLA loses efficiency: each flagship UNet level's conv shape,
forward and forward+backward, state-chained (per-op microbenchmarks through
the TPU tunnel are invalid — identical-input executions get memoized), with
an equivalent-FLOP matmul as the MXU roofline reference.

Usage: python benchmarks/conv_profile.py  (on the TPU host)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_TFLOPS = 197.0  # v5e

# flagship (examples/config_spherical_harmonics.json): 3D UNet, mc=64,
# mult (1,2,4,8), batch 32, 32^3 grid; 3D downsampling halves inner dims only
LEVEL_SHAPES = [
    # (B, D, H, W, Cin, Cout)
    (32, 32, 32, 32, 64, 64),    # level 0
    (32, 32, 16, 16, 128, 128),  # level 1
    (32, 32, 8, 8, 256, 256),    # level 2
    (32, 32, 4, 4, 512, 512),    # level 3 (bottleneck)
    (32, 32, 32, 32, 128, 64),   # level-0 decoder (skip concat)
]


def conv_flops(b, d, h, w, cin, cout, k=3):
    return 2 * b * d * h * w * cin * cout * k**3


def chain_time(body, x, iters=24, reps=3):
    """Time ``body`` state-chained INSIDE one jit program (lax.fori_loop):
    per-dispatch tunnel overhead (~1.7 ms measured) would otherwise dwarf
    millisecond kernels."""

    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x), x)

    x = run(x)  # compile + warm
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def profile_shape(b, d, h, w, cin, cout):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, d, h, w, cin), jnp.bfloat16) * 0.1
    kern = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.02
    back = (
        jax.random.normal(key, (cout, cin), jnp.bfloat16) * 0.02
        if cin != cout else None
    )

    def conv(x):
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def fwd_step(x):
        y = conv(x)
        if back is not None:
            y = y @ back
        return x + 0.001 * y.astype(x.dtype)

    def fwdbwd_step(x):
        def loss(x):
            return jnp.sum(conv(x).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(x)
        return x + 1e-6 * g.astype(x.dtype)

    fl = conv_flops(b, d, h, w, cin, cout)
    t_f = chain_time(fwd_step, x0)
    t_fb = chain_time(fwdbwd_step, x0)
    # fwd+bwd here = fwd conv + dgrad (the kernel is not differentiated)
    return {
        "shape": f"{b}x{d}x{h}x{w} {cin}->{cout}",
        "fwd_ms": t_f * 1e3,
        "fwd_tfs": fl / t_f / 1e12,
        "fwd_mfu": fl / t_f / 1e12 / PEAK_BF16_TFLOPS,
        "fwdbwd_ms": t_fb * 1e3,
        "fwdbwd_tfs": 2 * fl / t_fb / 1e12,
        "fwdbwd_mfu": 2 * fl / t_fb / 1e12 / PEAK_BF16_TFLOPS,
    }


def profile_matmul(m, k, n):
    """Equivalent-FLOP matmul roofline reference."""
    key = jax.random.PRNGKey(1)
    a0 = jax.random.normal(key, (m, k), jnp.bfloat16) * 0.05
    bmat = jax.random.normal(key, (k, n), jnp.bfloat16) * 0.05
    proj = jax.random.normal(key, (n, k), jnp.bfloat16) * 0.05

    def step(a):
        return a + 0.001 * ((a @ bmat) @ proj)

    t = chain_time(step, a0)
    fl = 2 * m * k * n + 2 * m * n * k
    return fl / t / 1e12


def main():
    print(f"backend={jax.default_backend()} devices={len(jax.devices())}")
    for shp in LEVEL_SHAPES:
        r = profile_shape(*shp)
        print(
            f"{r['shape']:>28}: fwd {r['fwd_ms']:7.2f} ms "
            f"{r['fwd_tfs']:6.1f} TF/s ({r['fwd_mfu']:.0%})   "
            f"fwd+bwd {r['fwdbwd_ms']:7.2f} ms "
            f"{r['fwdbwd_tfs']:6.1f} TF/s ({r['fwdbwd_mfu']:.0%})",
            flush=True,
        )
    for m, k, n in [
        (32 * 32 * 32 * 32, 27 * 64, 64),     # level-0 conv as im2col matmul
        (32 * 32 * 16 * 16, 27 * 128, 128),
        (32 * 32 * 8 * 8, 27 * 256, 256),
        (32 * 32 * 4 * 4, 27 * 512, 512),
        (8192, 4096, 4096),                   # generic large matmul
    ]:
        tfs = profile_matmul(m, k, n)
        print(
            f"matmul {m}x{k}x{n}: {tfs:6.1f} TF/s "
            f"({tfs / PEAK_BF16_TFLOPS:.0%})",
            flush=True,
        )


if __name__ == "__main__":
    main()
