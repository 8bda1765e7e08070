"""Blocked-on-device time accounting.

The reference prints wall-clock phase timers (burst.c:1916-1925, 5162);
a TPU deployment additionally wants to know how much of a batch's wall
time the chip itself was busy, so throughput numbers can be turned into
an MFU (fraction-of-peak) figure. Every device result in this codebase
is fetched through one of a handful of batched `jax.device_get` calls
placed directly after their dispatch chains; timing those blocking
fetches measures the dispatch-to-ready window of each chain, i.e. an
upper bound on device-busy time for the batch (it includes the
device->host transfer and, on tunneled rigs, the RPC round trip -- so
the MFU derived from it is a lower bound).

Usage:
    with devtime.track() as acc:
        aligner.align_batch(...)
    acc["s"]   # seconds blocked on device fetches
    acc["n"]   # number of batched fetches

Tracking is off by default and costs one `is None` check per fetch.
"""
from __future__ import annotations

import contextlib
import time

_acc = None


def fetch(tree):
    """jax.device_get with optional blocked-time accounting."""
    import jax

    if _acc is None:
        return jax.device_get(tree)
    t0 = time.perf_counter()
    out = jax.device_get(tree)
    _acc["s"] += time.perf_counter() - t0
    _acc["n"] += 1
    return out


@contextlib.contextmanager
def track():
    """Accumulate blocked-on-device seconds for fetches in this scope."""
    global _acc
    prev = _acc
    _acc = {"s": 0.0, "n": 0}
    try:
        yield _acc
    finally:
        _acc = prev
