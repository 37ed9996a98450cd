"""Which phrasing of the SAME 3x3x3 conv does XLA:TPU run fastest?

Motivation: benchmarks/conv_profile.py shows fwd conv at 44% MFU while the
mathematically-identical dgrad conv (inside fwd+bwd) lands near the matmul
ceiling — XLA may pick different algorithms/layouts per dimension_numbers
phrasing. Each variant computes the same function (up to weight layout);
state-chained in one program.

Usage: python benchmarks/conv_dimnum_sweep.py [level]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK = 197.0
LEVELS = {
    "0": (32, 32, 32, 32, 64),
    "1": (32, 32, 16, 16, 128),
    "2": (32, 32, 8, 8, 256),
    "3": (32, 32, 4, 4, 512),
}


def timeit(fn, x, iters=24, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: fn(x), x)

    x = run(x)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    lvl = sys.argv[1] if len(sys.argv) > 1 else "1"
    b, d, h, w, c = LEVELS[lvl]
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, d, h, w, c), jnp.bfloat16) * 0.1
    k = jax.random.normal(key, (3, 3, 3, c, c), jnp.bfloat16) * 0.02
    fl = 2 * b * d * h * w * c * c * 27
    print(f"backend={jax.default_backend()} level={lvl} shape={x0.shape}", flush=True)

    def report(name, conv):
        t = timeit(lambda x: x + 0.001 * conv(x).astype(x.dtype), x0)
        print(
            f"{name:>22}: {t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TF/s "
            f"({fl/t/1e12/PEAK:4.0%})",
            flush=True,
        )

    # a) the current phrasing
    report("DHWIO", lambda x: jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")))

    # b) dgrad-style phrasing: flipped kernel + IO swap, transposed back.
    #    numerically a different function of k but the same FLOP structure
    #    XLA uses for the input gradient
    kf = jnp.flip(k, (0, 1, 2)).swapaxes(3, 4)
    report("flip+OI (dgrad form)", lambda x: jax.lax.conv_general_dilated(
        x, kf, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWOI", "NDHWC")))

    # c) actual jax dgrad expression for this conv (transposed conv)
    _, vjp = jax.vjp(lambda xx: jax.lax.conv_general_dilated(
        xx, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")), x0)
    report("jax dgrad(vjp)", lambda g: vjp(g)[0])

    # d) NCDHW activation layout
    x_nc = jnp.moveaxis(x0, -1, 1)
    k_oi = jnp.transpose(k, (4, 3, 0, 1, 2))  # OIDHW

    def conv_ncdhw(x):
        return jax.lax.conv_general_dilated(
            x, k_oi, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "OIDHW", "NCDHW"))

    t = timeit(lambda x: x + 0.001 * conv_ncdhw(x).astype(x.dtype), x_nc)
    print(f"{'NCDHW/OIDHW':>22}: {t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TF/s "
          f"({fl/t/1e12/PEAK:4.0%})", flush=True)

    # e) batch folded into depth: one (B*D)-deep volume, depth-halo wrong at
    #    batch seams but FLOP-identical — tests whether the 5-D shape itself
    #    (small D tiles) is the slowdown
    x_fold = x0.reshape(1, b * d, h, w, c)
    t = timeit(lambda x: x + 0.001 * jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")).astype(x.dtype), x_fold)
    print(f"{'fold B into D':>22}: {t*1e3:6.2f} ms  {fl/t/1e12:6.1f} TF/s "
          f"({fl/t/1e12/PEAK:4.0%})", flush=True)


if __name__ == "__main__":
    main()
