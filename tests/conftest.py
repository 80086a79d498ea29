"""Test configuration: CPU backend, 8 fake devices (for sharding tests), x64.

NOTE: this environment's sitecustomize registers the TPU (axon) PJRT plugin
at interpreter start — before conftest runs — so plain env vars are too
late.  `jax.config.update("jax_platforms", ...)` works as long as no
backend has been touched yet, and XLA_FLAGS is still read at first backend
initialization (SURVEY.md §4 'Multi-device without a pod').
"""

import os

if os.environ.get("PIGS_TEST_TPU", "") in ("", "0"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
else:
    # PIGS_TEST_TPU=1: run on the real chip (compiled-Pallas parity tests;
    # f64 stays off — TPUs have no native float64)
    import jax  # noqa: F401
