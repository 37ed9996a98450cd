"""Accelerator runtime introspection — the TPU-native analogue of the
reference's XPUAccelerator surface (/root/reference/rho_diffusion/xpu.py:
140-242: device parsing, setup/teardown, memory stats, availability probe).

Under jax there is no device placement to manage (jit + shardings own
placement), so what remains is introspection: device inventory, memory
stats, availability checks, and a cross-process barrier.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def accelerator_available(platform: str = "tpu") -> bool:
    """Availability probe (reference xpu.py:218-230)."""
    try:
        return any(d.platform == platform for d in jax.devices())
    except RuntimeError:
        return False


def parse_devices(devices: Any = None) -> list:
    """Device-spec parsing (reference xpu.py:147-164): None/-1 -> all,
    int n -> first n, list of ids -> those ids."""
    all_devices = jax.devices()
    if devices is None or devices == -1:
        return all_devices
    if isinstance(devices, int):
        return all_devices[:devices]
    return [all_devices[i] for i in devices]


def get_device_stats(device: Optional[Any] = None) -> dict:
    """Per-device memory statistics (reference xpu.py:190-191 exposed
    torch.xpu.memory_stats)."""
    device = device or jax.devices()[0]
    stats = device.memory_stats() or {}
    return {
        "platform": device.platform,
        "device_kind": device.device_kind,
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


def barrier(name: str = "rho_barrier") -> None:
    """Cross-process synchronisation (reference setup used explicit dummy
    collectives as barriers, xpu.py:374-393; here one tiny psum)."""
    if jax.process_count() == 1:
        return
    x = jnp.ones((jax.local_device_count(),))
    jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()


def mpi_world_from_env(env: Optional[dict] = None) -> Optional[dict]:
    """Resolve world size / rank / coordinator from MPI-launcher env vars.

    The reference's IntelMPIEnvironment read Intel MPI's PMI_* variables
    with Open MPI and torchrun fallbacks, and resolved the rendezvous host
    from HYDRA_BSTRAP_LOCALHOST (/root/reference/rho_diffusion/xpu.py:
    81-129; utils.py:45-81 used tcp://127.0.0.1:29600). This keeps that
    launcher contract so ``mpiexec -n N python scripts/training_ddp.py``
    works unchanged: the same env vars now feed
    ``jax.distributed.initialize`` instead of a torch process group.

    Returns None when no launcher env is present (single-process run), else
    ``{num_processes, process_id, local_rank, coordinator_address}``.
    """
    import os

    env = os.environ if env is None else env

    def _first(*names: str) -> Optional[str]:
        for name in names:
            value = env.get(name)
            if value not in (None, ""):
                return value
        return None

    size = _first("PMI_SIZE", "OMPI_COMM_WORLD_SIZE", "WORLD_SIZE")
    if size is None or int(size) <= 1:
        return None
    rank = _first("PMI_RANK", "OMPI_COMM_WORLD_RANK", "RANK") or "0"
    local = _first("MPI_LOCALRANKID", "OMPI_COMM_WORLD_LOCAL_RANK", "LOCAL_RANK")
    local_size = _first(
        "MPI_LOCALNRANKS", "OMPI_COMM_WORLD_LOCAL_SIZE", "LOCAL_WORLD_SIZE",
    )
    host = _first("HYDRA_BSTRAP_LOCALHOST", "MASTER_ADDR")
    if host is None:
        # A loopback rendezvous only works when every rank is on this node.
        # Open MPI exposes no coordinator host; if the launch is provably
        # multi-node (local world < global world), demand an explicit
        # address instead of silently hanging every remote rank against
        # its own localhost.
        if local_size is not None and int(local_size) < int(size):
            raise RuntimeError(
                f"multi-node launch detected ({local_size} local of {size} "
                "global ranks) but no coordinator address: set MASTER_ADDR "
                "(and optionally MASTER_PORT) to rank 0's host, or launch "
                "with Intel MPI (HYDRA_BSTRAP_LOCALHOST).",
            )
        host = "127.0.0.1"
    port = _first("MASTER_PORT") or "29600"
    return {
        "num_processes": int(size),
        "process_id": int(rank),
        "local_rank": int(local) if local is not None else None,
        "local_size": int(local_size) if local_size is not None else None,
        "coordinator_address": f"{host}:{port}",
    }


def runtime_summary() -> dict:
    return {
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "devices": [str(d) for d in jax.devices()],
    }
