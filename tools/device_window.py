#!/usr/bin/env python
"""Opportunistic device-window runner for the stalling dev tunnel.

The dev rig's TPU link oscillates between multi-minute stalls and
short healthy windows. This loop probes the device in a subprocess
(an in-process probe on a dead tunnel would wedge *us*) and, the
moment a window opens, runs the next pending device-bound artifact
task. Results land in the repo for the round record:

  1. bench        -> BENCH_LOCAL_r04.json  (wants "path": "device";
                     a host-path metric is kept as provisional and the
                     task retries on later windows)
  2. shards1      -> SCALING_SHARDS1_r04.json (scaling_probe on the
                     real chip: fixed mesh cost at n_shards=1)
  3. verify_tpu   -> VERIFY_TPU_r04.txt (on-TPU byte-identity gate)

Every task is already internally stall-resilient (devtime fetch
watchdog + host fallbacks + bench supervisor), so a window closing
mid-task degrades the task, never this loop. Ctrl-C to stop.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = ("import jax, jax.numpy as jnp;"
         "jax.device_get(jnp.zeros((8,), jnp.int32) + 1)")


def log(msg):
    print(f"[devwindow {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def probe(timeout=90) -> bool:
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def last_json_line(text: str):
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def run_bench() -> bool:
    env = dict(os.environ, BENCH_DEADLINE_S=os.environ.get(
        "DEVWINDOW_BENCH_S", "1500"))
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, env=env,
                       cwd=REPO)
    rec = last_json_line(r.stdout)
    log(f"bench rc={r.returncode} parsed={rec is not None} "
        f"path={rec.get('path') if rec else None} "
        f"value={rec.get('value') if rec else None}")
    if rec is None:
        return False
    out = {"rc": r.returncode, "parsed": rec,
           "stderr_tail": r.stderr[-3000:]}
    with open(os.path.join(REPO, "BENCH_LOCAL_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    return rec.get("path") == "device"


def run_shards1() -> bool:
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "scaling_probe.py")],
        capture_output=True, text=True, cwd=REPO, timeout=2400,
        env=dict(os.environ, PROBE_DEADLINE_S="1800"))
    rec = last_json_line(r.stdout)
    log(f"shards1 rc={r.returncode} parsed={rec is not None}")
    if rec is None or r.returncode != 0:
        return False
    with open(os.path.join(REPO, "SCALING_SHARDS1_r04.json"),
              "w") as f:
        json.dump(rec, f, indent=1)
    return True


def run_verify() -> bool:
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "verify_tpu.py")],
        capture_output=True, text=True, cwd=REPO, timeout=3600)
    ok = r.returncode == 0
    log(f"verify_tpu rc={r.returncode}")
    if r.stdout.strip():
        with open(os.path.join(REPO, "VERIFY_TPU_r04.txt"), "w") as f:
            f.write(r.stdout)
    return ok


TASKS = [("bench", run_bench), ("shards1", run_shards1),
         ("verify_tpu", run_verify)]


def main():
    done = set()
    only = os.environ.get("DEVWINDOW_ONLY")
    while len(done) < len(TASKS):
        if not probe():
            log("stalled; sleeping")
            time.sleep(150)
            continue
        for name, fn in TASKS:
            if name in done or (only and name != only):
                continue
            log(f"window open -> {name}")
            try:
                if fn():
                    done.add(name)
                    log(f"{name}: DONE")
                else:
                    log(f"{name}: incomplete; will retry")
            except subprocess.TimeoutExpired:
                log(f"{name}: timeout; will retry")
            break
        else:
            break
        time.sleep(10)
    log(f"finished: {sorted(done)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
