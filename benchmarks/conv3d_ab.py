"""A/B: Pallas conv3d kernel vs XLA conv_general_dilated on the real chip.

State-chained inside one jit program (lax.fori_loop) — per-dispatch tunnel
overhead would otherwise dominate (see benchmarks/conv_profile.py).
Also numerics parity at each shape (compiled, not interpret mode).

Usage: python benchmarks/conv3d_ab.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache — remote compiles through the tunnel are minutes
os.makedirs("/tmp/rho_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/rho_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from rho_diffusion_tpu.ops.pallas.conv3d import conv3d_pallas, conv3d_tile_plan

PEAK = 197.0  # v5e bf16 TFLOP/s

SHAPES = [
    (32, 32, 32, 32, 64, 64),
    (32, 32, 16, 16, 128, 128),
    (32, 32, 8, 8, 256, 256),
    (32, 32, 4, 4, 512, 512),
    (32, 32, 32, 32, 128, 64),
    (32, 32, 4, 4, 1024, 512),
]


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
    shapes = SHAPES
    if len(sys.argv) > 1:  # run a single shape: python conv3d_ab.py <idx>
        shapes = [SHAPES[int(sys.argv[1])]]
    print(f"backend={jax.default_backend()}", flush=True)
    for b, d, h, w, cin, cout in shapes:
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (b, d, h, w, cin), jnp.bfloat16) * 0.1
        kern = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.02
        back = (
            jax.random.normal(key, (cout, cin), jnp.bfloat16) * 0.02
            if cin != cout else None
        )

        def chain(conv):
            def step(x):
                y = conv(x)
                if back is not None:
                    y = (y @ back).astype(x.dtype)
                return x + 0.001 * y.astype(x.dtype)
            return step

        def xla_conv(x):
            return jax.lax.conv_general_dilated(
                x, kern, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        def pallas_conv(x):
            return conv3d_pallas(x, kern)

        # compiled numerics parity first
        ya = xla_conv(x0)
        yb = pallas_conv(x0)
        err = float(
            jnp.max(jnp.abs(ya.astype(jnp.float32) - yb.astype(jnp.float32))),
        )
        ref = float(jnp.max(jnp.abs(ya.astype(jnp.float32)))) or 1.0

        fl = 2 * b * d * h * w * cin * cout * 27
        t_x = timeit(chain(xla_conv), x0)
        t_p = timeit(chain(pallas_conv), x0)
        td, tc = conv3d_tile_plan(d, h, w, cin, cout)
        print(
            f"{b}x{d}x{h}x{w} {cin:>4}->{cout:<4} (Td={td:>2},Tc={tc:>3}): "
            f"xla {t_x*1e3:6.2f} ms ({fl/t_x/1e12/PEAK:4.0%})  "
            f"pallas {t_p*1e3:6.2f} ms ({fl/t_p/1e12/PEAK:4.0%})  "
            f"speedup {t_x/t_p:4.2f}x  maxerr {err:.2e} (rel {err/ref:.2e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
