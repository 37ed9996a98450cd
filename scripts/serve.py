"""Serve a trained diffusion model over HTTP.

TPU-native counterpart of re-running `/root/reference/scripts/inference.py`
per request: the model is loaded and the per-bucket samplers compiled ONCE,
then concurrent requests are micro-batched onto the chip
(rho_diffusion_tpu/serving.py).

Usage:
    python scripts/serve.py CONFIG.json [-p CKPT] [--port 8000] \
        [--sampler ddim] [--steps 50] [--buckets 1,2,4,8] [--warmup]

Endpoints: GET /healthz, GET /stats, POST /generate
    {"conditions": [[l, m], ...] | null, "n": 4, "seed": 7}
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("json_config", type=Path)
    parser.add_argument("-p", dest="checkpoint", type=Path, default=None)
    parser.add_argument("-d", "--device", default=None)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--sampler", default=None, choices=["ddpm", "ddim", "dpm++", "unipc"])
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument(
        "--spacing", default=None,
        choices=["uniform-t", "uniform-lambda", "trailing", "karras"],
        help="respacing grid (default: sampler-aware). Use 'trailing' to "
             "serve a progressively-distilled student (scripts/distill.py) "
             "— it was trained on the trailing grid",
    )
    parser.add_argument(
        "--guidance", type=float, default=None,
        help="classifier-free guidance scale (1.0 = off; needs a model "
             "trained with cond_dropout > 0)",
    )
    parser.add_argument(
        "--buckets", default="1,2,4,8",
        help="comma-separated compiled batch sizes (ascending)",
    )
    parser.add_argument(
        "--cond-dim", type=int, default=None,
        help="condition-row width; omit for an unconditional service",
    )
    parser.add_argument(
        "--warmup", action="store_true",
        help="compile every bucket before accepting requests",
    )
    parser.add_argument(
        "--transfer-dtype", default=None, choices=["bfloat16", "float16"],
        help="narrow the device->host sample transfer (host widens back to "
             "float32); halves D2H bytes per launch on slow links",
    )
    parser.add_argument(
        "--quant", default=None, choices=["int8"],
        help="quantize convs to int8 (W8A8) on the int8 MXU — ~2x conv "
        "throughput, same checkpoint (ops/quant.py)",
    )
    parser.add_argument(
        "--data-parallel", type=int, default=0, metavar="N",
        help="shard every launch over an N-chip data-parallel mesh "
             "(buckets must be divisible by N)",
    )
    parser.add_argument(
        "--context-parallel", type=int, default=1, metavar="M",
        help="additionally shard the volume depth over M chips (halo convs "
             "+ ring attention) — serve volumes past one chip's HBM",
    )
    args = parser.parse_args()

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
        if args.device == "cpu":
            os.environ["PALLAS_AXON_POOL_IPS"] = ""

    # persistent compile cache: a restarted (or horizontally scaled) server
    # re-loads its bucket programs in seconds instead of recompiling
    # (measured 151 s cold for the 32^3 DDIM-50 buckets, RESULTS.md)
    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax

    from http.server import ThreadingHTTPServer

    from rho_diffusion_tpu.serving import SamplingService, make_http_handler

    kwargs: dict = {"batch_buckets": tuple(int(b) for b in args.buckets.split(","))}
    if args.sampler:
        kwargs["sampler"] = args.sampler
    if args.steps:
        kwargs["num_steps"] = args.steps
    if args.spacing:
        kwargs["spacing"] = args.spacing
    if args.guidance is not None:
        kwargs["guidance_scale"] = args.guidance  # 1.0 == unguided no-op
    if args.cond_dim is not None:
        kwargs["cond_dim"] = args.cond_dim
    kwargs["warmup"] = args.warmup
    if args.transfer_dtype:
        kwargs["transfer_dtype"] = args.transfer_dtype
    if args.quant:
        kwargs["quantize"] = args.quant
    if args.data_parallel or args.context_parallel > 1:
        from rho_diffusion_tpu.parallel.mesh import make_mesh

        kwargs["mesh"] = make_mesh(
            data=args.data_parallel or -1, context=args.context_parallel,
        )

    service = SamplingService.from_config(
        args.json_config, checkpoint=args.checkpoint, **kwargs,
    )
    server = ThreadingHTTPServer(
        (args.host, args.port), make_http_handler(service),
    )
    print(
        f"serving on http://{args.host}:{server.server_address[1]} "
        f"(buckets={kwargs['batch_buckets']}, "
        f"sampler={service.sampler}, steps={service.num_steps})",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
