"""Test configuration: force an 8-device virtual CPU mesh.

Kernel correctness and multi-chip sharding are validated on CPU (the
same XLA programs run on TPU; bench.py and the driver's compile checks
exercise the real chip). The environment's sitecustomize registers the
axon TPU backend at interpreter start, so plain env vars are not enough:
we reconfigure jax before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
