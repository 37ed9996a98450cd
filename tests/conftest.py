"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initialises its backends, so every test exercises the same SPMD code paths
that run on a TPU pod slice — the multi-device answer the reference never
had (its distributed paths were only testable via mpiexec on real hardware).

Gotcha: a machine-level sitecustomize registers a tunneled-TPU ("axon")
backend at interpreter startup and sets jax_platforms directly, so env vars
alone are ignored by the time conftest runs; we must override through
jax.config before the first backend lookup. Without this, "CPU" tests
silently run over the TPU network tunnel (minutes per jit, one shared chip).
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got {jax.default_backend()}"
)
