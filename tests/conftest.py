"""Test configuration: force CPU with 8 virtual devices and float64.

Mirrors the reference's float64 numerics for golden comparisons and
provides the simulated multi-chip mesh the reference never had
(SURVEY.md section 4).

The session environment may pre-import jax at interpreter startup (a
sitecustomize on PYTHONPATH registers a remote-TPU PJRT plugin), so
env vars like JAX_PLATFORMS/XLA_FLAGS are read too late — the switch
to local CPU must go through jax.config, which still applies any time
before backend initialization.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"          # for any subprocesses
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on local CPU devices, got %r" % jax.devices()
)
