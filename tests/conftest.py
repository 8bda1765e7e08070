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

# The suite's own XLA compile cache lives apart from the production
# one: the round-4 segfault bisect showed jaxlib's CPU compiler (and
# its cache reader) faulting on one slab-path compile once enough
# prior compiles accumulate in a process -- that compile now runs in
# subprocesses (test_slab_stream), and a dedicated cache dir keeps
# suite churn from ever poisoning the production cache.
os.environ.setdefault("BURST_TPU_COMPILE_CACHE",
                      os.path.expanduser("~/.cache/burst_tpu_xla_test"))
os.environ.setdefault("BURST_TPU_CACHE_DIR",
                      os.path.expanduser("~/.cache/burst_tpu_xla_test"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
