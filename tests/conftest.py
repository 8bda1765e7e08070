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

# No persistent XLA compile cache under pytest: CPU compiles are cheap,
# and jaxlib's cache reader segfaults (zstd decompress of a partial
# entry) if any cache file is truncated -- one bad entry would take
# down the whole suite. The CLI/bench keep the cache (TPU compiles are
# expensive) behind a segfault-clearing supervisor (bench._supervise).
os.environ["BURST_TPU_NO_CACHE"] = "1"
os.environ["BURST_TPU_COMPILE_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
