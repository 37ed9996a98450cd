"""Device meshes and sharding helpers.

The TPU-native replacement for the reference's entire distributed runtime
(/root/reference/rho_diffusion/xpu.py:57-422 — MPI env plumbing, oneCCL
process groups, DDP wrappers, warm-up collectives): parallelism here is
compile-time SPMD. We build one ``jax.sharding.Mesh`` with axes

* ``data``    — batch (data parallel; gradient psum rides ICI),
* ``context`` — flattened spatial tokens (sequence/context parallel for
                volumetric attention; reserved by default size 1),

annotate shardings on the batch and (optionally) params, and let XLA insert
the collectives. Multi-host rendezvous is ``jax.distributed.initialize``
(replacing IntelMPIEnvironment, xpu.py:57-137).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CONTEXT_AXIS = "context"


def make_mesh(
    data: int = -1,
    context: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("data", "context") mesh. ``data=-1`` uses all remaining
    devices. Axis order puts ``context`` innermost so context-parallel
    collectives ride nearest-neighbour ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % context == 0, f"{n} devices not divisible by context={context}"
        data = n // context
    assert data * context == n, (
        f"mesh {data}x{context} != {n} available devices"
    )
    dev_array = np.asarray(devices).reshape(data, context)
    return Mesh(dev_array, (DATA_AXIS, CONTEXT_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, batch-dim sharded over "data"."""
    sh = batch_sharding(mesh)
    return {
        k: (jax.device_put(v, sh) if v is not None else None)
        for k, v in batch.items()
    }


def replicate_state(state, mesh: Mesh):
    """Fully replicate a train-state pytree over the mesh (pure DP)."""
    sh = replicated(mesh)
    return jax.device_put(state, sh)


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (replaces MPI/PMI env handling, xpu.py:57-137).
    Safe to call when single-process (no-ops on failure)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialised or single-process
