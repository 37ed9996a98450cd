#!/usr/bin/env python
"""mpiexec-launched training — name/launch parity for the reference's
``mpiexec -n N python scripts/training_ddp.py CONFIG.json``
(/root/reference/scripts/training_ddp.py:47-206).

The reference read Intel MPI's PMI_* env vars and bootstrapped a
torch.distributed "ccl" process group over a TCP store. Here the same env
vars (PMI_*, with Open MPI / torchrun fallbacks — see
``parallel.runtime.mpi_world_from_env``) feed ``jax.distributed.initialize``,
after which everything is the ordinary SPMD path: one jitted train step
compiled over the global mesh, per-host input sharding instead of a
DistributedSampler, lr scaled by sqrt(world size) as in the reference
(abstract_diffusion.py:118). With no launcher env present it degrades to a
plain single-process run, like ``scripts/training.py``.

On TPU pods you normally don't need mpiexec at all —
``scripts/training_multihost.py`` (or bare ``training.py`` under the TPU
runtime) picks up the pod topology from the TPU metadata. This entry point
exists for reference users whose cluster tooling is mpiexec-shaped.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("json_config", type=Path)
    parser.add_argument("-p", dest="model_checkpoint_path", default=None)
    parser.add_argument("-e", "--epochs", type=int, default=None)
    parser.add_argument("--work-dir", type=Path, default=Path("."))
    args = parser.parse_args()

    from rho_diffusion_tpu.parallel.runtime import mpi_world_from_env

    world = mpi_world_from_env()

    import jax

    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    from rho_diffusion_tpu.parallel.mesh import initialize_distributed

    if world is not None:
        # The launcher env explicitly demands a multi-process run, so a
        # rendezvous failure must be FATAL: swallowing it would leave every
        # rank as an independent process_count()==1 training, all writing
        # the same work_dir (jax.distributed.initialize raises on failure;
        # the forgiving initialize_distributed() wrapper is only for the
        # maybe-single-process path below).
        init_kwargs = dict(
            coordinator_address=world["coordinator_address"],
            num_processes=world["num_processes"],
            process_id=world["process_id"],
        )
        if world.get("local_rank") is not None and (world.get("local_size") or 1) > 1:
            # several ranks share this node: pin one local device per rank
            # (otherwise each process claims every local accelerator and
            # the second rank dies on the device lock)
            init_kwargs["local_device_ids"] = [world["local_rank"]]
        jax.distributed.initialize(**init_kwargs)
    else:
        # single process, or a managed environment (TPU pod / Slurm) where
        # jax.distributed can self-configure
        initialize_distributed()

    from rho_diffusion_tpu.config import ExperimentConfig
    from rho_diffusion_tpu.parallel.runtime import runtime_summary
    from rho_diffusion_tpu.training.trainer import Trainer

    if jax.process_index() == 0:
        print(runtime_summary(), flush=True)
    config = ExperimentConfig.from_json(args.json_config)
    trainer = Trainer(config, work_dir=args.work_dir)
    state = trainer.init_state(weights_path=args.model_checkpoint_path)
    trainer.fit(state, max_epochs=args.epochs)


if __name__ == "__main__":
    main()
