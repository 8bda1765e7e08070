"""Benchmark: end-to-end alignment throughput on one chip.

Workload: 100bp reads at 98% identity against a synthetic reference
database, full end-to-end (parse, process, phase-A scan of all
(read x tile) pairs, winner rescore, BEST-mode b6 emission).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"};
baseline is the reference's published >10,000 reads/s/chip figure
(/root/reference/README.md:16, see BASELINE.md).
"""
import json
import os
import sys
import tempfile
import time

import numpy as np

N_REFS = int(os.environ.get("BENCH_REFS", 2000))
REF_LEN = int(os.environ.get("BENCH_REF_LEN", 500))
N_READS = int(os.environ.get("BENCH_READS", 20000))
READ_LEN = 100
THRES = 0.98
BASELINE_READS_PER_SEC = 10_000.0


def make_workload(d):
    rng = np.random.default_rng(20260816)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    refs = []
    for i in range(N_REFS):
        refs.append((f"r{i:05d}",
                     rng.choice(bases, size=REF_LEN).tobytes().decode()))
    reads = []
    for i in range(N_READS):
        _, s = refs[int(rng.integers(0, N_REFS))]
        st = int(rng.integers(0, len(s) - READ_LEN))
        r = list(s[st:st + READ_LEN])
        for _ in range(int(rng.integers(0, 3))):
            p = int(rng.integers(0, READ_LEN))
            r[p] = "ACGT"[int(rng.integers(0, 4))]
        reads.append((f"q{i:06d}", "".join(r)))
    rfa = os.path.join(d, "refs.fa")
    qfa = os.path.join(d, "reads.fa")
    with open(rfa, "w") as f:
        for h, s in refs:
            f.write(f">{h}\n{s}\n")
    with open(qfa, "w") as f:
        for h, s in reads:
            f.write(f">{h}\n{s}\n")
    return rfa, qfa


def main():
    from burst_tpu.cli import main as cli_main

    with tempfile.TemporaryDirectory() as d:
        rfa, qfa = make_workload(d)
        out = os.path.join(d, "out.b6")
        args = ["burst_tpu", "-r", rfa, "-q", qfa, "-o", out,
                "-m", "BEST", "-i", str(THRES), "--noprogress"]
        # warm-up on a slice to exclude one-time jit compilation
        warm = os.path.join(d, "warm.fa")
        with open(qfa) as f:
            head = "".join([next(f) for _ in range(64)])
        with open(warm, "w") as f:
            f.write(head)
        cli_main(["burst_tpu", "-r", rfa, "-q", warm, "-o",
                  os.path.join(d, "w.b6"), "-m", "BEST", "-i", str(THRES),
                  "--noprogress"])
        t0 = time.perf_counter()
        rc = cli_main(args)
        dt = time.perf_counter() - t0
        assert rc in (0, None)
        n_rows = sum(1 for _ in open(out))
        reads_per_sec = N_READS / dt
        print(json.dumps({
            "metric": "100bp reads aligned/sec/chip at 98% id "
                      f"(full scan, {N_REFS * REF_LEN / 1e6:.1f} Mbp DB, "
                      f"{n_rows} hits)",
            "value": round(reads_per_sec, 1),
            "unit": "reads/s",
            "vs_baseline": round(reads_per_sec / BASELINE_READS_PER_SEC, 3),
        }))


if __name__ == "__main__":
    sys.exit(main())
