#!/usr/bin/env python
"""Model evaluation CLI — quality metrics the reference computed nowhere
(its only eval was epoch-end sample grids, SURVEY.md §3.5).

    python scripts/evaluate.py CONFIG.json -p model.npz [--num-batches 4]
        [--bpd] [-d tpu|cpu]

Reports, against real dataset batches:
* validation loss + PSNR (the reference's validation_step was a stub);
* Sinkhorn-Wasserstein divergence between generated and real fields
  (reference metrics/geom.py wrapped geomloss; pure-JAX here);
* optionally bits-per-dim via the full VLB loop (GaussianDiffusion family).
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("json_config", type=Path)
    parser.add_argument("-p", dest="model_checkpoint_path", default=None)
    parser.add_argument("-d", "--device", default=None)
    parser.add_argument("--num-batches", type=int, default=2)
    parser.add_argument("--bpd", action="store_true", help="bits-per-dim (slow)")
    parser.add_argument("--sampler", default="ddim")
    parser.add_argument("--steps", type=int, default=50)
    args = parser.parse_args()

    import os

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
        if args.device == "cpu":
            os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax
    import numpy as np

    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from rho_diffusion_tpu.config import ExperimentConfig
    from rho_diffusion_tpu.data.loader import DataLoader
    from rho_diffusion_tpu.metrics import WassersteinWrapper
    from rho_diffusion_tpu.registry import registry
    from rho_diffusion_tpu.training.trainer import build_pipeline_from_config

    from rho_diffusion_tpu.config import apply_torch_checkpoint_schedule_fixup

    config = ExperimentConfig.from_json(args.json_config)
    if apply_torch_checkpoint_schedule_fixup(
        config, args.model_checkpoint_path or config.inference.checkpoint,
    ):
        print("torch checkpoint + cosine schedule: using exact_reference table")
    dataset = registry.get("datasets", config.dataset.name)(**config.dataset.kwargs)
    pipeline = build_pipeline_from_config(config, dataset=dataset)
    state = pipeline.create_state(jax.random.PRNGKey(config.inference.seed))
    # shared weight resolution (.pth/.npz transplant, orbax dir with EMA
    # preferred, warnings on missing checkpoints) — same path as the
    # inference CLI and the serving layer
    from rho_diffusion_tpu.training.checkpoint import resolve_inference_params

    ckpt = args.model_checkpoint_path or config.inference.checkpoint
    params, messages = resolve_inference_params(state, config, ckpt)
    for m in messages:
        print(m)
    state = state.replace(params=params)

    loader = DataLoader(
        dataset, batch_size=config.training.batch_size, shuffle=False,
        seed=config.inference.seed,
    )
    report: dict = {"config": str(args.json_config), "checkpoint": str(ckpt)}

    losses, psnrs = [], []
    real = real_labels = None
    for i, batch in enumerate(loader):
        if i >= args.num_batches:
            break
        m = pipeline.validation_step(state, batch)
        losses.append(float(m["train_loss"]))
        psnrs.append(float(m["psnr"]))
        if real is None:
            real = batch["data"]
            real_labels = batch.get("labels")
    if real is None:
        raise SystemExit(
            f"evaluate: the loader yielded no batches — the dataset "
            f"({len(dataset)} samples) is smaller than "
            f"training.batch_size={config.training.batch_size} (drop_last) "
            f"or --num-batches is 0. Lower the batch size or pass more data.",
        )
    report["val_loss"] = float(np.mean(losses))
    report["val_psnr"] = float(np.mean(psnrs))

    # generated-vs-real Wasserstein
    use_hash = bool(getattr(dataset, "use_emb_as_labels", False))
    space = getattr(dataset, "parameter_space", None)
    kwargs = {}
    if hasattr(pipeline, "coeffs"):
        kwargs = {"sampler": args.sampler, "num_steps": args.steps}
    n = min(8, real.shape[0])
    gen = pipeline.generate(
        params, jax.random.PRNGKey(0), batch_size=n,
        parameter_space=space.parameters if space is not None else None,
        as_hash_embeddings=use_hash, **kwargs,
    )
    w = WassersteinWrapper(blur=0.05, num_iters=50)
    report["wasserstein_gen_vs_real"] = float(w(np.asarray(gen), real[:n]))
    report["generated_finite"] = bool(np.isfinite(np.asarray(gen)).all())

    if args.bpd and hasattr(pipeline, "calc_bpd"):
        k = min(4, n)
        out = pipeline.calc_bpd(
            params, jax.numpy.asarray(real[:k]), jax.random.PRNGKey(1),
            # thread the real rows' own conditions through the VLB loop —
            # a class-conditional model asserts on y=None (and scoring
            # p(x|y) with the matched y is the meaningful density anyway)
            conditions=(
                jax.numpy.asarray(real_labels[:k])
                if real_labels is not None else None
            ),
        )
        report["total_bpd"] = float(np.mean(np.asarray(out["total_bpd"])))
        report["prior_bpd"] = float(np.mean(np.asarray(out["prior_bpd"])))

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
