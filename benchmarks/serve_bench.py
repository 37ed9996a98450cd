"""Serving latency/throughput on the flagship 32^3 DDIM-50 workload.

Measures what a deployment sees from rho_diffusion_tpu.serving:
  * single-request latency (bucket 1) — p50 over N requests
  * batched throughput: many concurrent 1-sample requests coalesced by the
    micro-batching worker into bucket-8 launches
  * occupancy + volumes/sec

Run on the TPU:  python benchmarks/serve_bench.py
Tiny CPU smoke:  SERVE_SMOKE=1 python benchmarks/serve_bench.py
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from rho_diffusion_tpu.diffusion import GaussianDiffusionPipeline, LinearSchedule
    from rho_diffusion_tpu.serving import SamplingService

    smoke = os.environ.get("SERVE_SMOKE") == "1"
    grid = 8 if smoke else int(os.environ.get("SERVE_GRID", 32))
    mc = 16 if smoke else 64
    steps = 4 if smoke else int(os.environ.get("SERVE_STEPS", 50))
    sampler = os.environ.get("SERVE_SAMPLER", "ddim")
    buckets = tuple(
        int(b) for b in os.environ.get(
            "SERVE_BUCKETS", "1,2" if smoke else "1,8",
        ).split(",")
    )
    n_lat = 3 if smoke else int(os.environ.get("SERVE_NLAT", 8))
    n_load = 6 if smoke else int(os.environ.get("SERVE_NLOAD", 32))

    pipe = GaussianDiffusionPipeline(
        backbone="UNetv2",
        backbone_kwargs=dict(
            data_shape=(grid,) * 3,
            dims=3,
            in_channels=1,
            out_channels=1,
            model_channels=mc,
            num_res_blocks=2,
            channel_mult=(1, 2) if smoke else (1, 2, 4, 8),
            attention_resolutions=[16, 8],
            num_heads=4,
            num_classes=20,
            use_scale_shift_norm=True,
            dtype=jnp.bfloat16,
        ),
        schedule=LinearSchedule(100 if smoke else 1000),
        model_mean_type="epsilon",
        model_var_type="fixed_large",
        optimizer="AdamW",
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    cond_dim = 4 * mc

    t0 = time.perf_counter()
    # NOTE 64^3: host-side x_T generation is ~3-6 ms per 262k-voxel row, so
    # very short coalescing windows under-fill the big buckets — measured
    # occupancy 0.67 at 10 ms vs ~1.0 at 100 ms on the 64^3 workload
    delay = float(os.environ.get("SERVE_DELAY", 0.01))
    # CFG scale; unset = off. 1.0 compiles the plain sampler (reverse_process
    # treats it as unguided), 0.0 is a valid pure-unconditional scale.
    _g = os.environ.get("SERVE_GUIDANCE")
    guidance = float(_g) if _g is not None else None
    # narrow the D2H sample pull (bf16 halves the 8.4 MB/launch at 64^3)
    transfer_dtype = os.environ.get("SERVE_TRANSFER_DTYPE") or None
    # SERVE_QUANT=int8: W8A8 convs on the int8 MXU (ops/quant.py)
    quantize = os.environ.get("SERVE_QUANT") or None
    service = SamplingService(
        pipe, params, sampler=sampler, num_steps=steps, cond_dim=cond_dim,
        guidance_scale=guidance, transfer_dtype=transfer_dtype,
        quantize=quantize,
        batch_buckets=buckets, max_delay_s=delay, warmup=True,
    )
    compile_s = time.perf_counter() - t0

    import numpy as np

    conds1 = np.zeros((1, cond_dim), np.float32)

    # single-request latency (no contention -> bucket 1)
    lats = []
    for i in range(n_lat):
        t0 = time.perf_counter()
        res = service.generate(conditions=conds1, seed=i)
        lats.append(time.perf_counter() - t0)
        assert np.isfinite(res.samples).all()
    lats.sort()

    # concurrent load: n_load 1-sample requests submitted at once
    launches_before = service.stats()["launches"]
    t0 = time.perf_counter()
    futs = [
        service.submit(conditions=conds1, seed=1000 + i) for i in range(n_load)
    ]
    outs = [f.result() for f in futs]
    load_wall = time.perf_counter() - t0
    stats = service.stats()
    service.close()

    result = {
        "workload": f"{grid}^3 {sampler}-{steps} (bf16, mc={mc})"
        + (f" cfg={guidance}" if guidance is not None and guidance != 1.0 else "")
        + (f" xfer={transfer_dtype}" if transfer_dtype else "")
        + (f" quant={quantize}" if quantize else ""),
        "warmup_compile_s": round(compile_s, 1),
        "single_request_latency_p50_s": round(lats[len(lats) // 2], 4),
        "concurrent_requests": n_load,
        "concurrent_wall_s": round(load_wall, 3),
        "throughput_volumes_per_s": round(n_load / load_wall, 3),
        "mean_batch_occupancy": round(stats["mean_occupancy"], 3),
        "load_phase_launches": stats["launches"] - launches_before,
        "all_finite": all(np.isfinite(o.samples).all() for o in outs),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
