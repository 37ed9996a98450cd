"""Launcher-env resolution for scripts/training_ddp.py.

The reference's IntelMPIEnvironment read PMI_* (Intel MPI) with OMPI_* and
torchrun WORLD_SIZE/RANK fallbacks and resolved MASTER_ADDR from
HYDRA_BSTRAP_LOCALHOST (/root/reference/rho_diffusion/xpu.py:81-129).
``mpi_world_from_env`` keeps that contract for jax.distributed; these tests
pin the precedence so an mpiexec launch resolves identically here.
"""
from rho_diffusion_tpu.parallel.runtime import mpi_world_from_env


def test_no_launcher_env_is_single_process():
    assert mpi_world_from_env({}) is None


def test_world_size_one_is_single_process():
    assert mpi_world_from_env({"PMI_SIZE": "1", "PMI_RANK": "0"}) is None


def test_intel_mpi_pmi_vars():
    world = mpi_world_from_env({
        "PMI_SIZE": "4",
        "PMI_RANK": "2",
        "MPI_LOCALRANKID": "1",
        "HYDRA_BSTRAP_LOCALHOST": "node0.cluster",
    })
    assert world == {
        "num_processes": 4,
        "process_id": 2,
        "local_rank": 1,
        "local_size": None,
        "coordinator_address": "node0.cluster:29600",
    }


def test_open_mpi_fallback():
    world = mpi_world_from_env({
        "OMPI_COMM_WORLD_SIZE": "2",
        "OMPI_COMM_WORLD_RANK": "1",
        "OMPI_COMM_WORLD_LOCAL_RANK": "1",
    })
    assert world["num_processes"] == 2
    assert world["process_id"] == 1
    # reference default rendezvous: tcp://127.0.0.1:29600 (utils.py:45-81)
    assert world["coordinator_address"] == "127.0.0.1:29600"


def test_torchrun_fallback_and_master_addr_port():
    world = mpi_world_from_env({
        "WORLD_SIZE": "8",
        "RANK": "5",
        "LOCAL_RANK": "1",
        "MASTER_ADDR": "10.0.0.7",
        "MASTER_PORT": "12345",
    })
    assert world == {
        "num_processes": 8,
        "process_id": 5,
        "local_rank": 1,
        "local_size": None,
        "coordinator_address": "10.0.0.7:12345",
    }


def test_pmi_takes_precedence_over_fallbacks():
    world = mpi_world_from_env({
        "PMI_SIZE": "2",
        "PMI_RANK": "0",
        "WORLD_SIZE": "16",
        "RANK": "9",
    })
    assert world["num_processes"] == 2
    assert world["process_id"] == 0


def test_missing_rank_defaults_to_zero():
    world = mpi_world_from_env({"PMI_SIZE": "2"})
    assert world["process_id"] == 0
    assert world["local_rank"] is None


def test_local_size_resolved():
    world = mpi_world_from_env({
        "OMPI_COMM_WORLD_SIZE": "4",
        "OMPI_COMM_WORLD_RANK": "1",
        "OMPI_COMM_WORLD_LOCAL_RANK": "1",
        "OMPI_COMM_WORLD_LOCAL_SIZE": "4",
    })
    assert world["local_size"] == 4
    assert world["coordinator_address"] == "127.0.0.1:29600"


def test_multinode_without_coordinator_raises():
    """Open MPI exposes no coordinator host; a provably multi-node launch
    (local world < global world) must fail loudly rather than hang every
    remote rank against its own localhost."""
    import pytest

    with pytest.raises(RuntimeError, match="MASTER_ADDR"):
        mpi_world_from_env({
            "OMPI_COMM_WORLD_SIZE": "8",
            "OMPI_COMM_WORLD_RANK": "5",
            "OMPI_COMM_WORLD_LOCAL_RANK": "1",
            "OMPI_COMM_WORLD_LOCAL_SIZE": "4",
        })


def test_multinode_with_master_addr_ok():
    world = mpi_world_from_env({
        "OMPI_COMM_WORLD_SIZE": "8",
        "OMPI_COMM_WORLD_RANK": "5",
        "OMPI_COMM_WORLD_LOCAL_RANK": "1",
        "OMPI_COMM_WORLD_LOCAL_SIZE": "4",
        "MASTER_ADDR": "10.0.0.3",
    })
    assert world["coordinator_address"] == "10.0.0.3:29600"
