"""Probe: does XLA lower int8 x int8 -> int32 convs to the v5e's int8 MXU
path (394.7 TOPS peak, 2x bf16)?

If the flagship conv shapes run ~2x faster in int8, a weight+activation
quantized serving mode is worth building (sampling is fwd-conv-bound:
RESULTS.md roofline table). If int8 is NOT faster (XLA upcasts, or the int8
systolic path is unavailable for 3-D convs), drop the idea — record either
way.

Usage: python benchmarks/conv_int8_probe.py  (on the TPU host)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

PEAK_BF16_TFLOPS = 197.0
PEAK_INT8_TOPS = 394.7

LEVEL_SHAPES = [
    # (B, D, H, W, Cin, Cout) — flagship UNet levels (conv_profile.py)
    (32, 32, 32, 32, 64, 64),
    (32, 32, 16, 16, 128, 128),
    (32, 32, 8, 8, 256, 256),
    (32, 32, 4, 4, 512, 512),
]


def conv_flops(b, d, h, w, cin, cout, k=3):
    return 2 * b * d * h * w * cin * cout * k**3


def chain_time(body, x, iters=24, reps=3):
    @jax.jit
    def run(x):
        return jax.lax.fori_loop(0, iters, lambda i, x: body(x), x)

    x = run(x)
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(x))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def probe(b, d, h, w, cin, cout):
    key = jax.random.PRNGKey(0)
    flops = conv_flops(b, d, h, w, cin, cout)

    # bf16 reference
    xb = jax.random.normal(key, (b, d, h, w, cin), jnp.bfloat16) * 0.1
    kb = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.02

    def conv_bf16(x):
        y = jax.lax.conv_general_dilated(
            x, kb, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if cin != cout:
            y = y[..., :cin]
        return x + 0.001 * y.astype(x.dtype)

    t_bf16 = chain_time(conv_bf16, xb)

    # int8 x int8 -> int32
    xi = jax.random.randint(key, (b, d, h, w, cin), -127, 127, jnp.int8)
    ki = jax.random.randint(key, (3, 3, 3, cin, cout), -127, 127, jnp.int8)

    def conv_int8(x):
        y = jax.lax.conv_general_dilated(
            x, ki, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )
        if cin != cout:
            y = y[..., :cin]
        # requantize back to int8 to chain state (shift keeps it cheap)
        return (x.astype(jnp.int32) + (y >> 12)).astype(jnp.int8)

    try:
        t_int8 = chain_time(conv_int8, xi)
    except Exception as e:  # lowering not supported
        print(f"int8 conv failed at {(b,d,h,w,cin,cout)}: {type(e).__name__}: {e}")
        t_int8 = None

    mfu_bf16 = flops / t_bf16 / 1e12 / PEAK_BF16_TFLOPS
    line = (
        f"[{b}x{d}x{h}x{w} {cin}->{cout}] bf16 {t_bf16*1e3:7.3f} ms "
        f"({flops/t_bf16/1e12:6.1f} TF/s, {mfu_bf16*100:4.1f}% bf16 peak)"
    )
    if t_int8 is not None:
        mfu_int8 = flops / t_int8 / 1e12 / PEAK_INT8_TOPS
        line += (
            f" | int8 {t_int8*1e3:7.3f} ms ({flops/t_int8/1e12:6.1f} TOP/s, "
            f"{mfu_int8*100:4.1f}% int8 peak, {t_bf16/t_int8:4.2f}x bf16)"
        )
    print(line, flush=True)


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} devices={jax.device_count()}")
    for shape in LEVEL_SHAPES:
        probe(*shape)
