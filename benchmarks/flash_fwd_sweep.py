"""Flash-attention FORWARD block sweep at flagship-relevant token counts.

Round-1 left fwd at 0.85-1.05x XLA for T<=4096 (ROADMAP #3). This sweeps
(block_q, block_k) per T with state-chained in-program timing and prints
the XLA full-softmax baseline. B*H = 128 (flagship: batch 32 x 4 heads),
d = 64.

Usage: python benchmarks/flash_fwd_sweep.py [T ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from rho_diffusion_tpu.ops.attention import xla_attention
from rho_diffusion_tpu.ops.pallas.flash_attention import flash_attention

B, H, D = 8, 16, 64  # B*H = 128 like the flagship's attention call sites


def timeit(fn, q, k, v, iters=16, reps=3):
    @jax.jit
    def run(q):
        def body(i, q):
            o = fn(q, k, v)
            return q + 0.001 * o.astype(q.dtype)
        return jax.lax.fori_loop(0, iters, body, q)

    q = run(q)
    jax.block_until_ready(q)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(q))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ts = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 4096]
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.default_backend()} BH={B*H} d={D}", flush=True)
    for t in ts:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, t, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (B, t, H, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, t, H, D), jnp.bfloat16)
        base = timeit(xla_attention, q, k, v)
        print(f"T={t}: xla {base*1e3:7.3f} ms", flush=True)
        # auto = None blocks: single-k-block one-shot-softmax kernel when
        # K/V <= 2048, and no lse write on this fwd-only path
        auto = timeit(flash_attention, q, k, v)
        print(f"  flash auto        : {auto*1e3:7.3f} ms ({base/auto:4.2f}x xla)",
              flush=True)
        combos = {(512, 512), (1024, 1024), (256, 1024), (1024, 256),
                  (min(t, 2048), 256), (256, min(t, 2048)), (t, t),
                  (512, 2048), (2048, 512), (256, min(t, 4096)),
                  (128, min(t, 4096))}
        ok = [
            c for c in combos
            if c[0] <= t and c[1] <= t
            and c[0] * c[1] * 4 <= 8 * 1024 * 1024  # f32 score block VMEM
        ]
        for bq, bk in sorted(ok):
            fn = lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, block_q=bq, block_k=bk,
            )
            tt = timeit(fn, q, k, v)
            print(
                f"  flash Bq={bq:>4} Bk={bk:>4}: {tt*1e3:7.3f} ms "
                f"({base/tt:4.2f}x xla)",
                flush=True,
            )


if __name__ == "__main__":
    main()
