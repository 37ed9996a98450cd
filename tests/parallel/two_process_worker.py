"""Worker for the real 2-process jax.distributed test (VERDICT r2 item 3).

Each process: 4 virtual CPU devices, rendezvous with the coordinator, build
the Trainer's loader + mesh + SPMD train step, run 2 steps on its LOCAL
half of every global batch, and print the global batch shape and losses.
This is exactly the code path the reference needed mpiexec + real XPUs to
exercise (reference xpu.py:57-137, scripts/training_ddp.py:47-61):
* jax.distributed.initialize (scripts/training_multihost.py init path)
* DataLoader per-process sharding (data/loader.py)
* jax.make_array_from_process_local_data global-batch assembly
  (data/loader.py prefetch_to_device)
* gradient psum over the global 8-device mesh.
"""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
# drop any inherited device-count flag (the parent test process runs with
# 8 virtual devices; each worker must have exactly 4)
flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
flags.append("--xla_force_host_platform_device_count=4")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)
assert jax.process_count() == num_procs
assert len(jax.devices()) == 4 * num_procs, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np  # noqa: E402

from rho_diffusion_tpu.data.loader import DataLoader, prefetch_to_device  # noqa: E402
from rho_diffusion_tpu.diffusion import DDPM, LinearSchedule  # noqa: E402
from rho_diffusion_tpu.parallel.mesh import (  # noqa: E402
    active_mesh,
    batch_sharding,
    make_mesh,
    replicate_state,
)


class DeterministicDataset:
    parameter_space = None

    def __len__(self):
        return 16

    def __getitem__(self, i):
        rng = np.random.default_rng(i)
        return rng.uniform(-1, 1, (8, 8, 1)).astype(np.float32), None


pipe = DDPM(
    backbone="UNetv2",
    backbone_kwargs=dict(
        dims=2, in_channels=1, out_channels=1, model_channels=8,
        num_res_blocks=1, data_shape=(8, 8), channel_mult=(1, 2),
        attention_resolutions=[], num_heads=1, dtype=np.float32,
    ),
    schedule=LinearSchedule(20, 2e-4, 1e-2),
    optimizer="AdamW",
    opt_kwargs={"lr": 1e-3},
    ema_decay=0.0,
)
mesh = make_mesh()  # all 8 global devices on the data axis
state = pipe.create_state(jax.random.PRNGKey(0))
state = replicate_state(state, mesh)

loader = DataLoader(
    DeterministicDataset(), batch_size=8, shuffle=True, seed=0, num_workers=0,
)
loader.set_epoch(0)
sharding = batch_sharding(mesh)

losses = []
for i, batch in enumerate(prefetch_to_device(iter(loader), sharding)):
    if i >= 2:
        break
    # the assembled array must be GLOBAL (8 rows), not the 4-row local slice
    assert batch["data"].shape == (8, 8, 8, 1), batch["data"].shape
    with active_mesh(mesh):
        state, metrics = pipe.training_step(state, batch)
    losses.append(float(metrics["train_loss"]))

print(f"RESULT {proc_id} shape=(8, 8, 8, 1) losses={losses!r}", flush=True)
