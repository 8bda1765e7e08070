"""Test configuration: force an 8-device virtual CPU mesh before JAX import.

Kernels are validated on CPU (pallas interpret mode / pure-JAX paths);
multi-chip sharding tests use the 8 virtual devices. Real-TPU execution
is exercised by bench.py and the driver's compile checks.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
