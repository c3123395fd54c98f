"""Test configuration: force CPU with 8 virtual devices and float64.

Mirrors the reference's float64 numerics for golden comparisons and
provides the simulated multi-chip mesh the reference never had
(SURVEY.md section 4).  Must run before jax is imported.
"""
import os

# Hard override: the session environment pins JAX_PLATFORMS to the
# remote TPU tunnel; unit tests must run on local CPU devices.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
