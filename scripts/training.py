#!/usr/bin/env python
"""Config-driven training CLI (reference scripts/training.py parity).

    python scripts/training.py CONFIG.json [-d tpu|cpu] [-p weights.npz]
        [-e EPOCHS] [--pipeline NAME] [--profile DIR] [--work-dir DIR]

Differences from the reference (scripts/training.py:47-158), on purpose:
* no Lightning/IPEX/DDP plumbing — the Trainer compiles one SPMD train step
  over a jax device mesh; multi-host launch is `jax.distributed` (no mpiexec
  env vars to thread through);
* `-p` resumes backbone weights (.npz) like the reference's torch.load path
  (training.py:129-131); full-state resume happens automatically from the
  work dir's orbax checkpoints;
* the reference imported a non-existent `lightning_progress_bar` module and
  crashed at import (SURVEY.md §3.1); progress logging here just works.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "json_config",
        type=Path,
        help="Path to a JSON configuration file; see examples folder.",
    )
    parser.add_argument(
        "-d", "--device", default=None,
        help="Compute platform override [tpu/cpu] (reference flag parity)",
    )
    parser.add_argument(
        "-p", dest="model_checkpoint_path", default=None,
        help="backbone weights to initialise from: our .npz export, or a "
             "reference-trained torch model.pth (auto-transplanted)",
    )
    parser.add_argument("-e", "--epochs", type=int, default=None)
    parser.add_argument("--pipeline", default=None,
                        help="DDPM | GaussianDiffusionPipeline | DiffusersDDPMPipeline")
    parser.add_argument("--work-dir", type=Path, default=Path("."))
    parser.add_argument("--profile", default=None, help="jax.profiler trace dir")
    parser.add_argument("--no-resume", action="store_true")
    args = parser.parse_args()

    import os

    if args.device:  # platform override before jax init
        os.environ["JAX_PLATFORMS"] = args.device
        if args.device == "cpu":
            os.environ["PALLAS_AXON_POOL_IPS"] = ""

    import jax

    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from rho_diffusion_tpu.config import ExperimentConfig
    from rho_diffusion_tpu.parallel import initialize_distributed
    from rho_diffusion_tpu.training.trainer import Trainer, build_pipeline_from_config

    if int(os.environ.get("RHO_MULTIHOST", "0")):
        initialize_distributed()

    from rho_diffusion_tpu.config import apply_torch_checkpoint_schedule_fixup

    config = ExperimentConfig.from_json(args.json_config)
    if apply_torch_checkpoint_schedule_fixup(config, args.model_checkpoint_path):
        print("torch checkpoint + cosine schedule: using exact_reference table")
    print(f"devices: {jax.devices()}", flush=True)

    trainer = Trainer(
        config,
        work_dir=args.work_dir,
        profile_dir=args.profile,
    )
    if args.pipeline:
        trainer.pipeline = build_pipeline_from_config(
            config,
            dataset=trainer.dataset,
            world_size=trainer.world_size,
            pipeline_name=args.pipeline,
            steps_per_epoch=max(len(trainer.loader), 1),
        )
    state = trainer.init_state(
        resume=not args.no_resume,
        weights_path=args.model_checkpoint_path,
    )
    trainer.fit(state, max_epochs=args.epochs)


if __name__ == "__main__":
    main()
