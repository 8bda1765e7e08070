"""Shared golden-test utilities: synthetic data + oracle binary runner."""
import os
import shutil
import stat
import subprocess

import numpy as np

ORACLE_SRC = "/root/reference/bin/burst_linux_DB15"
ORACLE = "/tmp/burst_oracle15"
ORACLE12_SRC = "/root/reference/bin/burst_linux_DB12"
ORACLE12 = "/tmp/burst_oracle12"

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def oracle_path(db12=False):
    src, dst = (ORACLE12_SRC, ORACLE12) if db12 else (ORACLE_SRC, ORACLE)
    if not os.path.exists(dst):
        shutil.copy(src, dst)
        os.chmod(dst, os.stat(dst).st_mode | stat.S_IXUSR)
    return dst


def run_oracle(args, db12=False):
    cmd = [oracle_path(db12)] + args + ["-t", "1"]
    res = subprocess.run(cmd, capture_output=True, text=True)
    return res


def run_ours(args, expect=(0, None)):
    from burst_tpu.cli import main
    rc = main(["burst_tpu"] + args)
    if not isinstance(expect, tuple):
        expect = (expect,)
    assert rc in expect, rc
    return rc


def rand_dna(rng, n):
    return rng.choice(BASES, size=n).tobytes().decode()


def make_refs(rng, n_refs, lo=150, hi=400, prefix="ref"):
    """Random references (distinct with overwhelming probability)."""
    out = []
    for i in range(n_refs):
        out.append((f"{prefix}{i:04d}", rand_dna(rng, int(rng.integers(lo, hi)))))
    return out


def make_reads(rng, refs, n_reads, read_len=100, max_err=3, rc_frac=0.0,
               prefix="read"):
    """Reads sampled from refs with up to max_err substitutions."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for i in range(n_reads):
        _, seq = refs[int(rng.integers(0, len(refs)))]
        if len(seq) <= read_len:
            st = 0
            rl = len(seq)
        else:
            st = int(rng.integers(0, len(seq) - read_len))
            rl = read_len
        r = list(seq[st:st + rl])
        for _ in range(int(rng.integers(0, max_err + 1))):
            p = int(rng.integers(0, len(r)))
            r[p] = "ACGT"[int(rng.integers(0, 4))]
        s = "".join(r)
        if rc_frac and rng.random() < rc_frac:
            s = "".join(comp[c] for c in reversed(s))
        reads.append((f"{prefix}{i:05d}", s))
    return reads


def make_reads_indel(rng, refs, n_reads, read_len=100, max_err=3,
                     rc_frac=0.0, prefix="iread"):
    """Reads with a mix of substitutions, deletions and insertions, so
    gap counting / dual-objective tiebreaks / the len+gapQ identity
    divisor are exercised end-to-end (burst.c:771-798, 844-860)."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    reads = []
    for i in range(n_reads):
        _, seq = refs[int(rng.integers(0, len(refs)))]
        if len(seq) <= read_len:
            st, rl = 0, len(seq)
        else:
            st = int(rng.integers(0, len(seq) - read_len))
            rl = read_len
        r = list(seq[st:st + rl])
        for _ in range(int(rng.integers(0, max_err + 1))):
            kind = int(rng.integers(0, 3))
            p = int(rng.integers(0, len(r)))
            if kind == 0:
                r[p] = "ACGT"[int(rng.integers(0, 4))]
            elif kind == 1 and len(r) > 30:
                del r[p]
            else:
                r.insert(p, "ACGT"[int(rng.integers(0, 4))])
        s = "".join(r)
        if rc_frac and rng.random() < rc_frac:
            s = "".join(comp[c] for c in reversed(s))
        reads.append((f"{prefix}{i:05d}", s))
    return reads


def read_fasta(path):
    out = []
    name = None
    for line in open(path):
        line = line.strip()
        if line.startswith(">"):
            name = line[1:]
        elif name is not None:
            out.append((name, line))
            name = None
    return out


def write_fasta(path, entries):
    with open(path, "w") as f:
        for h, s in entries:
            f.write(f">{h}\n{s}\n")


def diff_files(a, b):
    with open(a) as fa, open(b) as fb:
        la, lb = fa.read(), fb.read()
    if la == lb:
        return None
    al, bl = la.splitlines(), lb.splitlines()
    msgs = [f"line counts: {len(al)} vs {len(bl)}"]
    for i, (x, y) in enumerate(zip(al, bl)):
        if x != y:
            msgs.append(f"first diff at line {i}:\n  oracle: {x}\n  ours:   {y}")
            break
    else:
        if len(al) != len(bl):
            longer = al if len(al) > len(bl) else bl
            who = "oracle" if len(al) > len(bl) else "ours"
            msgs.append(f"extra line in {who}: {longer[min(len(al),len(bl))]}")
    return "\n".join(msgs)


def sort_lines(path):
    with open(path) as f:
        return sorted(f.read().splitlines())
