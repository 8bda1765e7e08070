#!/usr/bin/env python3
"""Single-machine multi-host launcher (validation / dev rig).

Spawns N burst_tpu CLI processes wired together with jax.distributed
(Gloo over localhost), each owning a clump shard of the database --
the same code path a real multi-host TPU pod runs, minus the ICI.

    python tools/launch_multihost.py -n 2 [--port 45611] -- \
        -q q.fa -r db.edx -a db.acx -o out.b6 -m BEST

Process 0 writes the b6; the launcher exits nonzero if any process
fails. CPU backend is forced (JAX_PLATFORMS=cpu) so this runs anywhere;
on a real pod, launch one process per host with BURST_TPU_MULTIHOST set
(see burst_tpu/parallel/multihost.py).
"""
import argparse
import os
import subprocess
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=45611)
    ap.add_argument("cli", nargs=argparse.REMAINDER,
                    help="-- then burst_tpu.cli arguments")
    args = ap.parse_args(argv)
    cli = args.cli
    if cli and cli[0] == "--":
        cli = cli[1:]
    if not cli:
        ap.error("pass CLI arguments after --")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(args.nprocs):
        env = dict(os.environ)
        env["BURST_TPU_MULTIHOST"] = \
            f"{pid}/{args.nprocs}@localhost:{args.port}"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "burst_tpu.cli"] + cli, env=env,
            stdout=subprocess.DEVNULL if pid else None))
    rc = 0
    for p in procs:
        rc = rc or p.wait()
    return rc


if __name__ == "__main__":
    sys.exit(main())
