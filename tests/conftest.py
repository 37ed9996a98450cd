"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initialises, so every test exercises the same SPMD code paths that run on a
TPU pod slice — the multi-device answer the reference never had (its
distributed paths were only testable via mpiexec on real hardware)."""
import os

# The axon sitecustomize force-registers the tunneled-TPU backend via
# PALLAS_AXON_POOL_IPS; clear it so tests run on the local CPU platform.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
