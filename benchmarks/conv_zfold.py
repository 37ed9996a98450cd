"""Z-fold 3-D conv experiment: fold the kernel's depth taps into channels.

Round-2's per-shape profile (conv_profile.py) showed XLA's 3-D fwd conv at
24% MFU for C=64 but 44-50% for C>=128 — efficiency tracks the reduction
depth. A 3x3x3 conv can be phrased as ONE 2-D 3x3 conv whose input is the
depth-neighbourhood concatenation (B,D,H,W,3*Cin) and whose kernel is
(3,3,3*Cin,Cout): reduction depth triples (64 -> 192), which should lift
the dominant level-0 convs into the C>=128 efficiency class if the
concat's HBM traffic doesn't eat the win.

This differs from the measured-negative Conv3dVia2d (three separate 2-D
convs summed, 0.80x): here the taps join the contraction dimension instead
of adding a host of small convs.

Usage: python benchmarks/conv_zfold.py   (on the TPU host)
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

PEAK_BF16_TFLOPS = 197.0  # v5e

# flagship levels (see conv_profile.py; D never downsamples in 3D)
LEVEL_SHAPES = [
    (32, 32, 32, 32, 64, 64),    # level 0 — the 24%-MFU offender
    (32, 32, 16, 16, 128, 128),  # level 1
    (32, 32, 8, 8, 256, 256),    # level 2
    (32, 32, 4, 4, 512, 512),    # level 3 (bottleneck)
    (32, 32, 32, 32, 128, 64),   # level-0 decoder (skip concat)
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


def zfold_conv(x, kern):
    """3x3x3 'SAME' (symmetric) conv via depth-tap channel folding."""
    b, d, h, w, cin = x.shape
    cout = kern.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xz = jnp.concatenate([xp[:, 0:d], xp[:, 1:d + 1], xp[:, 2:d + 2]], axis=-1)
    # (kz,kh,kw,ci,co) -> (kh,kw,kz*ci,co) with tap-major channel blocks
    k2 = kern.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * cin, cout)
    y = jax.lax.conv_general_dilated(
        xz.reshape(b * d, h, w, 3 * cin), k2, (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y.reshape(b, d, h, w, cout)


def native_conv(x, kern):
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def profile(b, d, h, w, cin, cout):
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (b, d, h, w, cin), jnp.bfloat16) * 0.1
    kern = jax.random.normal(key, (3, 3, 3, cin, cout), jnp.bfloat16) * 0.02
    back = (
        jax.random.normal(key, (cout, cin), jnp.bfloat16) * 0.02
        if cin != cout else None
    )
    fl = conv_flops(b, d, h, w, cin, cout)

    # numerics check once per shape
    ref = native_conv(x0, kern)
    alt = zfold_conv(x0, kern)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - alt.astype(jnp.float32))))

    rows = {}
    for name, conv in (("native", native_conv), ("zfold", zfold_conv)):
        def fwd_step(x, conv=conv):
            y = conv(x, kern)
            if back is not None:
                y = y @ back
            return x + 0.001 * y.astype(x.dtype)

        def fwdbwd_step(x, conv=conv):
            def loss(x):
                return jnp.sum(conv(x, kern).astype(jnp.float32) ** 2)

            g = jax.grad(loss)(x)
            return x - 1e-6 * g.astype(x.dtype)

        tf = chain_time(fwd_step, x0)
        tb = chain_time(fwdbwd_step, x0)
        rows[name] = (tf, tb)
        print(
            f"  {name:7s} fwd {tf * 1e3:7.3f} ms ({fl / tf / 1e12:6.1f} TF/s,"
            f" {fl / tf / 1e12 / PEAK_BF16_TFLOPS * 100:4.1f}% peak) "
            f"fwd+bwd {tb * 1e3:7.3f} ms"
            f" ({3 * fl / tb / 1e12 / PEAK_BF16_TFLOPS * 100:4.1f}% peak)",
            flush=True,
        )
    sf = rows["native"][0] / rows["zfold"][0]
    sb = rows["native"][1] / rows["zfold"][1]
    print(f"  zfold speedup: fwd {sf:.2f}x  fwd+bwd {sb:.2f}x  |err| {err:.2e}",
          flush=True)
    return sf, sb


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    for shape in LEVEL_SHAPES:
        print(f"shape B{shape[0]} DHW{shape[1:4]} C{shape[4]}->{shape[5]}:",
              flush=True)
        profile(*shape)
