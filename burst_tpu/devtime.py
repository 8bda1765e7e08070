"""Blocked-on-device time accounting + device-stall recovery.

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

Stall recovery: the dev rig's tunneled TPU drops for minutes at a time,
and a blocked device fetch on a dropped tunnel never returns (jax
caches the broken client for the process lifetime). `fetch` therefore
runs the device_get on a worker thread with a timeout
(BURST_TPU_FETCH_TIMEOUT_S, default 240s; 0 disables). On timeout the
backend is marked dead for the rest of the process (`device_ok()`
flips False, so every dispatch site switches to the host kernels in
kernels/host.py) and the caller's `fallback` closure recomputes the
pending chunks on the CPU -- the batch completes with byte-identical
output. Callers without a fallback get a DeviceStall exception
(serving.Aligner retries the batch through the all-host path).

BURST_TPU_HOST=1 forces `device_ok()` False from the start: pure-CPU
execution that never touches (or initializes) a device backend.

Usage:
    with devtime.track() as acc:
        aligner.align_batch(...)
    acc["s"]   # seconds blocked on device fetches
    acc["n"]   # number of batched fetches

Tracking is off by default and costs one `is None` check per fetch.
"""
from __future__ import annotations

import contextlib
import functools
import os
import sys
import threading
import time

_acc = None
_DEAD = False
_KEEPALIVE = None


class DeviceStall(RuntimeError):
    """A device fetch exceeded BURST_TPU_FETCH_TIMEOUT_S."""


def keepalive(interval_s: float | None = None) -> dict:
    """Initialize the device client NOW on a daemon thread and touch
    the device periodically so the session never goes idle.

    Rationale: a long-lived process that does hours of host work and
    only then creates its first device client has been observed to
    block forever inside that late init on the tunneled rig, while a
    fresh process connects instantly -- the proxy appears to time out
    or mis-handle idle/late sessions. Connecting at process start
    (while the tunnel is demonstrably healthy) and issuing one tiny
    device_get every `interval_s` keeps the session warm, so the
    eventual device phase finds a live client instead of gambling on a
    cold connect. The thread is a daemon: if the tunnel is dead the
    worker blocks harmlessly and the host path proceeds unaffected.

    Returns the shared state dict: state['healthy'] is None until the
    first round trip resolves, then True/False; state['stop']=True
    ends the loop. Idempotent -- the second call returns the first
    state."""
    global _KEEPALIVE
    if _KEEPALIVE is not None:
        return _KEEPALIVE
    if interval_s is None:
        interval_s = float(os.environ.get("BURST_TPU_KEEPALIVE_S", "30"))
    state = {"healthy": None, "stop": False, "beats": 0}
    _KEEPALIVE = state

    def _worker():
        try:
            import jax
            import jax.numpy as jnp
            t0 = time.perf_counter()
            jax.device_get(jnp.zeros((8,), jnp.int32) + 1)
            state["healthy"] = True
            print(f"[burst_tpu] device client warm "
                  f"({time.perf_counter() - t0:.1f}s)",
                  file=sys.stderr, flush=True)
            hb = os.environ.get("BURST_TPU_HEARTBEAT_FILE")
            while not state["stop"] and not _DEAD:
                time.sleep(interval_s)
                jax.device_get(jnp.zeros((8,), jnp.int32) + 1)
                state["beats"] += 1
                if hb:
                    # a completed round trip proves the tunnel is alive
                    # even when the main thread sits in a minutes-long
                    # remote compile with zero local CPU/net movement;
                    # supervisors watch this file's mtime as liveness
                    try:
                        with open(hb, "a"):
                            pass
                        os.utime(hb, None)
                    except OSError:
                        pass
        except BaseException:
            state["healthy"] = False

    threading.Thread(target=_worker, daemon=True,
                     name="burst-tpu-keepalive").start()
    return state


def device_ok() -> bool:
    """False once the backend stalled (or under BURST_TPU_HOST=1):
    dispatch sites must route to the host kernels."""
    if _DEAD:
        return False
    return os.environ.get("BURST_TPU_HOST", "") in ("", "0")


def mark_dead(why: str = "stall"):
    global _DEAD
    if not _DEAD:
        print(f"[burst_tpu] device backend marked dead ({why}); "
              "continuing on host kernels", file=sys.stderr, flush=True)
    _DEAD = True


def _timeout_s() -> float:
    return float(os.environ.get("BURST_TPU_FETCH_TIMEOUT_S", "240"))


def _get(tree):
    import jax

    if _acc is None:
        return jax.device_get(tree)
    t0 = time.perf_counter()
    out = jax.device_get(tree)
    _acc["s"] += time.perf_counter() - t0
    _acc["n"] += 1
    return out


def fetch(tree, fallback=None):
    """jax.device_get with blocked-time accounting and a stall watchdog.

    `fallback`: zero-arg closure recomputing the same results on the
    host; invoked (and the backend marked dead) if the fetch times
    out. Without one, DeviceStall is raised instead.

    Pure-host short-circuit: when the backend is off (BURST_TPU_HOST=1
    or marked dead) and the tree holds no device arrays -- the normal
    state on the all-host path, where every chunk was pre-resolved to
    numpy -- return it directly: no worker thread, no jax.device_get,
    and no daemon thread left blocked on a dead tunnel.
    """
    if not device_ok():
        jax = sys.modules.get("jax")
        if jax is None:
            return tree
        if not any(isinstance(x, jax.Array)
                   for x in jax.tree_util.tree_leaves(tree)):
            return tree
    to = _timeout_s()
    if to <= 0:
        return _get(tree)
    box: list = []

    def _worker():
        try:
            box.append(("ok", _get(tree)))
        except BaseException as e:  # surfaced to the caller below
            box.append(("err", e))

    t = threading.Thread(target=_worker, daemon=True)
    t.start()
    t.join(to)
    if box:
        kind, val = box[0]
        if kind == "ok":
            return val
        raise val
    mark_dead(f"fetch exceeded {to:.0f}s")
    if fallback is not None:
        return fallback()
    raise DeviceStall(f"device fetch exceeded {to:.0f}s")


def probe(timeout_s: float = 60.0) -> bool:
    """Guarded device health check: one tiny compile+fetch round trip,
    run entirely on a worker thread (a dead tunnel hangs device_put and
    compilation too, not just fetches -- an unguarded probe would wedge
    the caller). On timeout the backend is marked dead so every
    dispatch site stays on the host kernels."""
    if not device_ok():
        return False
    box: list = []

    def _worker():
        try:
            import jax
            import jax.numpy as jnp
            jax.device_get(jnp.zeros((8,), jnp.int32) + 1)
            box.append(True)
        except BaseException:
            box.append(False)

    t = threading.Thread(target=_worker, daemon=True)
    t.start()
    t.join(timeout_s)
    if not box:
        mark_dead(f"probe exceeded {timeout_s:.0f}s")
        return False
    return bool(box[0])


def put_chunked(arr, max_bytes: int | None = None):
    """Upload a large host array to the device in restartable slices.

    The fused path's one-time device state (packed tile matrix,
    postings ids) is ~GBs; a single jnp.asarray of it is one giant
    transfer that a tunnel stall kills wholesale, leaves the
    supervisor's liveness counters silent for minutes, and cannot be
    watched. This splits the transfer into row slices written into a
    DONATED device buffer via dynamic_update_slice (no 2x staging), so
    each slice is a short RPC: progress is visible (BURST_TPU_INIT_LOG=1),
    a mid-init stall costs one slice's worth of retry window instead of
    the whole state, and the per-fetch watchdog gets a chance to fire
    between slices. Chunk size: BURST_TPU_PUT_CHUNK_MB (default 64)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    arr = np.ascontiguousarray(arr)
    if max_bytes is None:
        max_bytes = int(float(os.environ.get(
            "BURST_TPU_PUT_CHUNK_MB", "64")) * (1 << 20))
    if arr.nbytes <= max_bytes or arr.ndim == 0 or arr.shape[0] < 2:
        return jnp.asarray(arr)
    rows = max(1, int(max_bytes // max(1, arr.nbytes // arr.shape[0])))
    log = os.environ.get("BURST_TPU_INIT_LOG") == "1"

    @functools.partial(jax.jit, donate_argnums=0)
    def _upd(buf, chunk, i0):
        return jax.lax.dynamic_update_slice(
            buf, chunk, (i0,) + (0,) * (arr.ndim - 1))

    t0 = time.perf_counter()
    state = {"done": 0, "out": None, "err": None}

    def _run():
        try:
            buf = jnp.zeros(arr.shape, arr.dtype)
            for i0 in range(0, arr.shape[0], rows):
                if i0 + rows > arr.shape[0]:
                    # ragged tail: re-slice a full window ending at the
                    # last row (re-sends a few rows; keeps one
                    # compiled shape)
                    i0 = arr.shape[0] - rows
                chunk = jnp.asarray(arr[i0: i0 + rows])
                buf = _upd(buf, chunk, i0)
                done = min(i0 + rows, arr.shape[0])
                state["done"] = done
                if log:
                    print(f"[burst_tpu] device upload "
                          f"{done}/{arr.shape[0]} rows "
                          f"({done / arr.shape[0]:.0%}, "
                          f"{time.perf_counter() - t0:.1f}s)",
                          file=sys.stderr, flush=True)
            buf.block_until_ready()
            state["out"] = buf
        except BaseException as e:  # re-raised on the caller below
            state["err"] = e

    stall_s = float(os.environ.get("BURST_TPU_PUT_STALL_S", "150"))
    if stall_s <= 0:
        _run()
        if state["err"] is not None:
            raise state["err"]
        return state["out"]
    # progress watchdog: the transfer runs on a daemon worker and the
    # caller watches the row counter -- a tunnel window dying
    # mid-stream (observed: ~350 MB in, then silence) otherwise leaves
    # an unguarded jnp.asarray blocked forever. No per-chunk sync is
    # added, so healthy-link pipelining is untouched.
    th = threading.Thread(target=_run, daemon=True,
                          name="burst-tpu-upload")
    th.start()
    last, t_adv = -1, time.time()
    while th.is_alive():
        th.join(5.0)
        if state["done"] != last:
            last, t_adv = state["done"], time.time()
        elif time.time() - t_adv > stall_s:
            mark_dead(f"device upload stalled at row {last}/"
                      f"{arr.shape[0]} for {stall_s:.0f}s")
            raise DeviceStall(
                f"upload stalled at {last}/{arr.shape[0]} rows")
    if state["err"] is not None:
        raise state["err"]
    return state["out"]


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
