#!/usr/bin/env python
"""Multi-host training launcher (parity surface for the reference's
mpiexec-driven scripts/training_ddp.py:47-206).

The reference bootstrapped torch.distributed from PMI/MPI env vars with a
TCP rendezvous and wrapped the model in DDP. Here multi-host is
``jax.distributed.initialize`` — on TPU pods the coordinator and process
ids come from the TPU metadata automatically; elsewhere pass them
explicitly:

    # on each host (example for 2 hosts):
    python scripts/training_multihost.py CONFIG.json \
        --coordinator 10.0.0.1:9999 --num-processes 2 --process-id $RANK

Everything after initialisation is identical to scripts/training.py: the
same SPMD train step compiles over the global mesh, per-host input sharding
replaces the DistributedSampler, and the lr scales by sqrt(world size) as
in the reference (abstract_diffusion.py:118).
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("json_config", type=Path)
    parser.add_argument("--coordinator", default=None,
                        help="coordinator_address host:port (auto on TPU pods)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("-p", dest="model_checkpoint_path", default=None)
    parser.add_argument("-e", "--epochs", type=int, default=None)
    parser.add_argument("--work-dir", type=Path, default=Path("."))
    args = parser.parse_args()

    import jax

    from rho_diffusion_tpu.utils import enable_persistent_compile_cache

    enable_persistent_compile_cache()

    kwargs = {}
    if args.coordinator:
        kwargs = dict(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    jax.distributed.initialize(**kwargs)

    from rho_diffusion_tpu.config import ExperimentConfig
    from rho_diffusion_tpu.parallel.runtime import runtime_summary
    from rho_diffusion_tpu.training.trainer import Trainer

    print(runtime_summary(), flush=True)
    config = ExperimentConfig.from_json(args.json_config)
    trainer = Trainer(config, work_dir=args.work_dir)
    state = trainer.init_state(weights_path=args.model_checkpoint_path)
    trainer.fit(state, max_epochs=args.epochs)


if __name__ == "__main__":
    main()
