"""Test configuration: force an 8-virtual-device CPU platform so sharding and
collective paths are exercised without TPU hardware — directly fixing the
reference's no-distributed-testing gap (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Force CPU unless the caller explicitly requests TPU (TDX_TEST_TPU=1).
# The axon sitecustomize registers the TPU plugin before conftest runs and
# ignores the JAX_PLATFORMS env var, so use jax.config directly.
if not os.environ.get("TDX_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    # full-precision matmuls for tight CPU equivalence tolerances; NOT set on
    # TPU runs — "highest" would force unsupported multi-pass emulation
    # inside the Pallas kernels' bf16 dots.
    jax.config.update("jax_default_matmul_precision", "highest")
