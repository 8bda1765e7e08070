#!/usr/bin/env python
"""On-TPU verification gate: golden byte-identity on real hardware.

Runs a small golden set end-to-end ON THE DEFAULT JAX BACKEND (the real
chip in the bench environment) and byte-compares our b6/artifact output
against the reference oracle binary for every device code path:

  - direct full path (streamed phase A + rescore; Pallas Myers/rescore
    kernels engage on TPU where the jnp fallback runs on CPU tests)
  - accel path, three scour variants: fused device scan (default),
    two-step device scour (BURST_TPU_FUSED=0), host C++ scour
    (BURST_TPU_DEV_SCOUR=0)
  - slab-streamed tiles (BURST_TPU_TILE_HBM_MB tiny) on device
  - the Pallas kernel sweep (tools/validate_myers_pallas.py)

The CPU test suite proves the jnp paths byte-identical; this gate
proves the Pallas/TPU paths, closing the round-1 gap where a Pallas
regression could ship invisibly (kernels only engage when
jax.devices()[0] is a TPU, kernels/rescore.py:_use_pallas).

Usage (bench environment, ~3-6 min incl. compiles):

    python tools/verify_tpu.py            # exit 0 = all byte-identical

Fails loudly (exit 1 + per-config FAIL lines) on any byte diff. Modes
and flag matrix mirror the reference CLI surface (burst.c:4912-5103).
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tests import golden  # noqa: E402

FAILS = []


def _check(tag, ob6, mb6):
    diff = golden.diff_files(ob6, mb6)
    if diff is None:
        print(f"  OK   {tag}")
    else:
        FAILS.append(tag)
        print(f"  FAIL {tag}\n{diff}")


def _ours(args, env=None):
    """Run our CLI in-process (keeps kernel compile caches warm across
    configs) with optional env overrides for the path gates."""
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        golden.run_ours(args)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _wait_for_device(max_wait: float = 300.0):
    """The tunneled dev TPU stalls for minutes at a time; wait for a
    healthy round-trip (probed in subprocesses -- an in-process
    device_get on a hung tunnel blocks forever) before driving the
    golden set. The wait is capped at `max_wait` seconds; after that,
    proceed regardless."""
    import subprocess
    import time

    if (os.environ.get("JAX_PLATFORMS") or "").startswith("cpu"):
        return
    probe = ("import jax, jax.numpy as jnp;"
             "jax.device_get(jnp.zeros((8,), jnp.int32) + 1)")
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=60, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        time.sleep(15)


def main() -> int:
    import jax
    _wait_for_device()
    want = os.environ.get("JAX_PLATFORMS")
    cur = jax.config.jax_platforms
    if want and cur != want and (not cur or "axon" in cur.split(",")):
        # env var wins over the sitecustomize plugin default (see
        # cli._pin_platform); lets `JAX_PLATFORMS=cpu` smoke-run the
        # gate without probing the TPU tunnel
        jax.config.update("jax_platforms", want)
    plat = jax.devices()[0].platform.lower()
    print(f"backend: {plat} ({len(jax.devices())} device(s))")
    if "tpu" not in plat and "axon" not in plat:
        print("WARNING: not a TPU backend -- Pallas kernels will not "
              "engage; this run only re-proves the jnp paths.")

    d = tempfile.mkdtemp(prefix="verify_tpu_")
    rng = np.random.default_rng(460123)
    refs = golden.make_refs(rng, 40, lo=200, hi=700)
    reads = (golden.make_reads(rng, refs, 150, read_len=100, max_err=3,
                               rc_frac=0.35)
             + golden.make_reads_indel(rng, refs, 120, read_len=100,
                                       max_err=3, rc_frac=0.35))
    rfa, qfa = os.path.join(d, "refs.fa"), os.path.join(d, "q.fa")
    golden.write_fasta(rfa, refs)
    golden.write_fasta(qfa, reads)
    tax = os.path.join(d, "tax.tsv")
    with open(tax, "w") as f:
        for i, (h, _) in enumerate(refs):
            f.write(f"{h}\tk__K{i % 3};p__P{i % 5};c__C{i}\n")

    # --- direct full path (streamed select + windowed rescore) -------
    print("direct full path:")
    for mode, extra in (("BEST", ("-fr",)), ("ALLPATHS", ("-fr",)),
                        ("FORAGE", ("-i", "0.9")),
                        ("CAPITALIST", ("-b", tax, "-fr"))):
        ob6 = os.path.join(d, f"o_{mode}.b6")
        mb6 = os.path.join(d, f"m_{mode}.b6")
        res = golden.run_oracle(["-r", rfa, "-q", qfa, "-o", ob6,
                                 "-m", mode, *extra])
        assert res.returncode == 0, res.stderr + res.stdout
        _ours(["-r", rfa, "-q", qfa, "-o", mb6, "-m", mode, *extra])
        _check(f"direct {mode} {' '.join(extra)}", ob6, mb6)

    # --- artifacts + accel path, all three scour variants ------------
    print("accel path (k=12 artifacts):")
    oedx, oacx = os.path.join(d, "o.edx"), os.path.join(d, "o.acx")
    medx, macx = os.path.join(d, "m.edx"), os.path.join(d, "m.acx")
    res = golden.run_oracle(["-r", rfa, "-o", oedx, "-a", oacx,
                             "-d", "DNA", "320", "-s"], db12=True)
    assert res.returncode == 0, res.stderr + res.stdout
    _ours(["-r", rfa, "-o", medx, "-a", macx, "-d", "DNA", "320", "-s",
           "--kmer", "12"], env={"BURST_TPU_SCOUR_N": "12"})
    for tag, a, b in (("edx bytes", oedx, medx), ("acx bytes", oacx,
                                                  macx)):
        with open(a, "rb") as f1, open(b, "rb") as f2:
            same = f1.read() == f2.read()
        if same:
            print(f"  OK   artifact {tag}")
        else:
            FAILS.append(tag)
            print(f"  FAIL artifact {tag}")

    scour_envs = (
        ("fused-scan", {}),
        ("device-scour-two-step", {"BURST_TPU_FUSED": "0"}),
        ("host-scour", {"BURST_TPU_DEV_SCOUR": "0"}),
    )
    for mode in ("BEST", "ALLPATHS", "CAPITALIST"):
        ob6 = os.path.join(d, f"oa_{mode}.b6")
        res = golden.run_oracle(["-r", oedx, "-a", oacx, "-q", qfa,
                                 "-o", ob6, "-m", mode], db12=True)
        assert res.returncode == 0, res.stderr + res.stdout
        for sname, senv in scour_envs:
            mb6 = os.path.join(d, f"ma_{mode}_{sname}.b6")
            _ours(["-r", medx, "-a", macx, "-q", qfa, "-o", mb6,
                   "-m", mode],
                  env={"BURST_TPU_SCOUR_N": "12", **senv})
            _check(f"accel {mode} [{sname}]", ob6, mb6)

    # --- slab streaming under a forced tiny HBM budget ---------------
    # oracle outputs are re-derived here (not reused from the accel
    # section) so a failure there cannot mask a slab diff
    print("slab streaming (BURST_TPU_TILE_HBM_MB=0.0001):")
    for mode in ("BEST", "ALLPATHS"):
        ob6 = os.path.join(d, f"os_{mode}.b6")
        mb6 = os.path.join(d, f"ms_{mode}.b6")
        res = golden.run_oracle(["-r", oedx, "-a", oacx, "-q", qfa,
                                 "-o", ob6, "-m", mode], db12=True)
        assert res.returncode == 0, res.stderr + res.stdout
        _ours(["-r", medx, "-a", macx, "-q", qfa, "-o", mb6, "-m", mode],
              env={"BURST_TPU_SCOUR_N": "12",
                   "BURST_TPU_TILE_HBM_MB": "0.0001"})
        _check(f"slab accel {mode}", ob6, mb6)
    ob6 = os.path.join(d, "os_direct.b6")
    res = golden.run_oracle(["-r", rfa, "-q", qfa, "-o", ob6,
                             "-m", "BEST", "-fr"])
    assert res.returncode == 0, res.stderr + res.stdout
    mb6 = os.path.join(d, "ms_direct.b6")
    _ours(["-r", rfa, "-q", qfa, "-o", mb6, "-m", "BEST", "-fr"],
          env={"BURST_TPU_TILE_HBM_MB": "0.0001"})
    _check("slab direct BEST", ob6, mb6)

    # --- Pallas kernel equality sweep ---------------------------------
    print("pallas kernel sweep:")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import validate_myers_pallas
    rc = validate_myers_pallas.main()
    if rc != 0:
        FAILS.append("pallas kernel sweep")

    if FAILS:
        print(f"\nVERIFY_TPU: {len(FAILS)} FAILURE(S): {FAILS}")
        return 1
    print("\nVERIFY_TPU: all byte-identical")
    return 0


if __name__ == "__main__":
    sys.exit(main())
