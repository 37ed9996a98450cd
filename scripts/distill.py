#!/usr/bin/env python
"""Progressive-distillation CLI: halve a trained pipeline's sampling steps.

    python scripts/distill.py CONFIG.json -p teacher.npz \
        --from 32 --to 4 --updates 1000 --lr 1e-4 -o student.npz

Loads the teacher exactly like scripts/inference.py (orbax full state with
EMA preferred, reference ``model.pth`` auto-transplant, ``.npz``), cascades
halving stages 32 -> 16 -> ... -> 4 (Salimans & Ho, arXiv:2202.00512; each
stage update is one jitted program, see diffusion/distill.py), and writes
the student weights as an ``.npz``. Sample the result with

    python scripts/inference.py CONFIG.json -p student.npz \
        --sampler ddim --steps 4 --spacing trailing

(the ``trailing`` grid is what the student was trained on — uniform-t
striding would evaluate it at timesteps it never saw).

The reference framework has no distillation surface at all; its only
fast-sampling story is DDIM striding
(/root/reference/rho_diffusion/diffusion/gaussian_diffusion.py:654-702).
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
    parser.add_argument("-p", dest="model_checkpoint_path", type=Path, default=None)
    parser.add_argument("-d", "--device", default=None)
    parser.add_argument(
        "--from", dest="from_steps", type=int, default=32,
        help="teacher grid size the cascade starts from (a 2^k multiple of --to)",
    )
    parser.add_argument(
        "--to", dest="to_steps", type=int, default=4,
        help="student model evaluations to distill down to",
    )
    parser.add_argument(
        "--updates", type=int, default=1000, help="optimizer updates per halving stage",
    )
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--batch-size", type=int, default=None,
                        help="default: training.batch_size")
    parser.add_argument(
        "-o", "--output", type=Path, default=Path("student.npz"),
        help="student weights output (.npz, loadable via -p everywhere)",
    )
    parser.add_argument(
        "--sample-output", type=Path, default=None,
        help="optionally sample the student and write a PNG grid here",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--work-dir", type=Path, default=Path("."))
    args = parser.parse_args()

    if args.device:
        os.environ["JAX_PLATFORMS"] = args.device
        if args.device == "cpu":
            os.environ["PALLAS_AXON_POOL_IPS"] = ""

    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    import jax
    import numpy as np

    from rho_diffusion_tpu.config import ExperimentConfig
    from rho_diffusion_tpu.data import DataLoader
    from rho_diffusion_tpu.data.loader import prefetch_to_device
    from rho_diffusion_tpu.diffusion import ProgressiveDistiller
    from rho_diffusion_tpu.training.checkpoint import save_model_weights
    from rho_diffusion_tpu.training.trainer import build_inference_session

    config = ExperimentConfig.from_json(args.json_config)
    ckpt = args.model_checkpoint_path or config.inference.checkpoint
    pipeline, dataset, params, messages = build_inference_session(
        config, checkpoint=ckpt, work_dir=args.work_dir,
    )
    for m in messages:
        print(m)
    if not hasattr(pipeline, "coeffs"):
        raise SystemExit(
            f"distillation needs the GaussianDiffusion pipeline family "
            f"(a coefficient table to stride); got {type(pipeline).__name__}",
        )
    if dataset is None:
        raise SystemExit(
            "the configured dataset could not be constructed — distillation "
            "draws x_t from real data (config.dataset)",
        )

    batch_size = args.batch_size or config.training.batch_size

    def _epochs():
        while True:  # the cascade consumes stages*updates batches
            yield from prefetch_to_device(
                iter(DataLoader(dataset, batch_size=batch_size, num_workers=0)),
            )

    data_iter = _epochs()
    d = ProgressiveDistiller(pipeline, opt_kwargs={"lr": args.lr})
    student, info = d.distill(
        params,
        lambda _i: next(data_iter),
        from_steps=args.from_steps,
        to_steps=args.to_steps,
        updates_per_stage=args.updates,
        rng=jax.random.PRNGKey(args.seed),
        log_fn=lambda rec: print(
            f"stage {rec['stage']}: loss {rec['loss_first']:.4f} -> "
            f"{rec['loss_last']:.4f}", flush=True,
        ),
    )
    save_model_weights(student, args.output)
    print(f"wrote {args.output} ({args.to_steps}-step student; sample with "
          f"--steps {args.to_steps} --spacing trailing)")

    if args.sample_output:
        from rho_diffusion_tpu.utils import plot_tensor_images

        n = config.inference.num_samples or 8
        use_hash = bool(getattr(dataset, "use_emb_as_labels", False))
        space = config.inference.parameter_space or getattr(
            dataset, "parameter_space", None,
        )
        conds = None
        if space is not None:
            conds = pipeline.conditions_from_parameter_space(
                getattr(space, "parameters", space), n, random=False,
                as_hash_embeddings=use_hash,
                embedding_dim=pipeline.condition_embedding_dim(),
            )
        out = d.sample(
            student, jax.random.PRNGKey(args.seed + 1),
            pipeline.sample_shape(n), n_steps=args.to_steps, conditions=conds,
        )
        out = np.asarray(out)
        print(f"sampled {out.shape}, finite={np.isfinite(out).all()}")
        plot_tensor_images(out, filename=args.sample_output)
        print(f"wrote {args.sample_output}")


if __name__ == "__main__":
    main()
